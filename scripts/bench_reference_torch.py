"""Reference-side benchmark: the 'produce both sides' requirement
(BASELINE.md). Measures, on THIS machine's CPU:

  1. a torch-eager reference-equivalent UNet (the clean app's
     DoubleConv/Down/Up/SelfAttention architecture,
     DDPM_clean_application/src/unet_ms.py:5-178, re-written here from its
     description — structure-equal to our flagship ConditionalUNet), and
  2. our JAX flagship at identical shapes,

for train steps/sec (fwd+bwd+opt) and sampler forwards/sec. Writes
BENCH_REFERENCE.json; bench.py uses the measured torch/jax efficiency
ratio for an honest vs_baseline instead of a hand-waved constant.

Run:  python scripts/bench_reference_torch.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
BATCH, SIZE = 4, 64
N_ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- torch side
def build_torch_model():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class DC(nn.Module):  # DoubleConv: conv-GN(1)-GELU-conv-GN(1) (+res)
        def __init__(self, cin, cout, mid=None, residual=False):
            super().__init__()
            mid = mid or cout
            self.residual = residual
            self.net = nn.Sequential(
                nn.Conv2d(cin, mid, 3, padding=1, bias=False),
                nn.GroupNorm(1, mid),
                nn.GELU(),
                nn.Conv2d(mid, cout, 3, padding=1, bias=False),
                nn.GroupNorm(1, cout),
            )

        def forward(self, x):
            h = self.net(x)
            return F.gelu(x + h) if self.residual else h

    class Down(nn.Module):
        def __init__(self, cin, cout, tdim):
            super().__init__()
            self.pool = nn.MaxPool2d(2)
            self.res = DC(cin, cin, residual=True)
            self.proj = DC(cin, cout)
            self.emb = nn.Sequential(nn.SiLU(), nn.Linear(tdim, cout))

        def forward(self, x, t):
            x = self.proj(self.res(self.pool(x)))
            return x + self.emb(t)[:, :, None, None]

    class Up(nn.Module):
        def __init__(self, cin, cout, tdim):
            super().__init__()
            self.up = nn.Upsample(scale_factor=2, mode="bilinear",
                                  align_corners=True)
            self.res = DC(cin, cin, residual=True)
            self.proj = DC(cin, cout, mid=cin // 2)
            self.emb = nn.Sequential(nn.SiLU(), nn.Linear(tdim, cout))

        def forward(self, x, skip, t):
            x = torch.cat([skip, self.up(x)], dim=1)
            x = self.proj(self.res(x))
            return x + self.emb(t)[:, :, None, None]

    class SA(nn.Module):  # self-attention + transformer FF
        def __init__(self, ch, heads=4):
            super().__init__()
            self.ln = nn.LayerNorm(ch)
            self.mha = nn.MultiheadAttention(ch, heads, batch_first=True)
            self.ff = nn.Sequential(
                nn.LayerNorm(ch), nn.Linear(ch, ch), nn.GELU(),
                nn.Linear(ch, ch),
            )

        def forward(self, x):
            b, c, h, w = x.shape
            t = x.reshape(b, c, h * w).swapaxes(1, 2)
            a, _ = self.mha(self.ln(t), self.ln(t), self.ln(t))
            t = a + t
            t = self.ff(t) + t
            return t.swapaxes(1, 2).reshape(b, c, h, w)

    class UNet(nn.Module):
        def __init__(self, cin=1, cout=1, tdim=256):
            super().__init__()
            self.tdim = tdim
            self.inc = DC(cin, 64)
            self.d1, self.sa1 = Down(64, 128, tdim), SA(128)
            self.d2, self.sa2 = Down(128, 256, tdim), SA(256)
            self.d3, self.sa3 = Down(256, 256, tdim), SA(256)
            self.b1, self.b2 = DC(256, 256), DC(256, 256)
            self.u1, self.sa4 = Up(512, 128, tdim), SA(128)
            self.u2, self.sa5 = Up(256, 64, tdim), SA(64)
            self.u3 = Up(128, 64, tdim)
            self.out = nn.Conv2d(64, cout, 1)

        def pos(self, t):
            import math

            half = self.tdim // 2
            freqs = torch.exp(
                -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
            )
            ang = t[:, None].float() * freqs[None]
            return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)

        def forward(self, x, t):
            temb = self.pos(t)
            x1 = self.inc(x)
            x2 = self.sa1(self.d1(x1, temb))
            x3 = self.sa2(self.d2(x2, temb))
            x4 = self.sa3(self.d3(x3, temb))
            x4 = self.b2(self.b1(x4))
            h = self.sa4(self.u1(x4, x3, temb))
            h = self.sa5(self.u2(h, x2, temb))
            h = self.u3(h, x1, temb)
            return self.out(h)

    return UNet()


def bench_torch():
    import torch

    torch.manual_seed(0)
    model = build_torch_model()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    x = torch.randn(BATCH, 1, SIZE, SIZE)
    t = torch.randint(1, 1000, (BATCH,))
    target = torch.randn_like(x)

    # train step (eager, like training_DANRA_conditional.py:953-984)
    def step():
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(model(x, t), target)
        loss.backward()
        opt.step()

    step()
    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        step()
    train_sps = N_ITERS / (time.perf_counter() - t0)
    log(f"torch train: {train_sps:.3f} steps/s")

    # sampler forward (no_grad, the 999-step loop's unit cost)
    with torch.no_grad():
        model(x, t)
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            model(x, t)
        fwd_sps = N_ITERS / (time.perf_counter() - t0)
    log(f"torch sample fwd: {fwd_sps:.3f} fwd/s")
    return train_sps, fwd_sps


# ------------------------------------------------------------------ jax side
def bench_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodelscustom_tpu.core import GaussianDiffusion
    from diffusionmodelscustom_tpu.models import ConditionalUNet
    from diffusionmodelscustom_tpu.train import Trainer, TrainerConfig

    model = ConditionalUNet(
        out_channels=1, base_channels=64, time_dim=256, n_heads=4,
        num_classes=None, attention_levels=(1, 2, 3),
        attention_levels_up=(2, 1),
    )
    diffusion = GaussianDiffusion.create(n_timesteps=1000)
    trainer = Trainer(model, diffusion, TrainerConfig(loss="simple", ema=False))
    rng = jax.random.key(0)
    batch = {"img": jax.random.normal(rng, (BATCH, SIZE, SIZE, 1))}
    state = trainer.init_state(rng, batch)

    state, m = trainer.train_step(state, batch, rng)
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for i in range(N_ITERS):
        state, m = trainer.train_step(state, batch, jax.random.fold_in(rng, i))
    float(jax.device_get(m["loss"]))
    train_sps = N_ITERS / (time.perf_counter() - t0)
    log(f"jax train: {train_sps:.3f} steps/s")

    params = state.params
    fwd = jax.jit(
        lambda x, t: model.apply({"params": params}, x, t)
    )
    x = batch["img"]
    t = jnp.full((BATCH,), 500, jnp.int32)
    np.asarray(jax.device_get(fwd(x, t)))[0, 0, 0]
    t0 = time.perf_counter()
    y = x
    for _ in range(N_ITERS):
        y = fwd(y * 0.99, t)
    np.asarray(jax.device_get(y))[0, 0, 0]
    fwd_sps = N_ITERS / (time.perf_counter() - t0)
    log(f"jax sample fwd: {fwd_sps:.3f} fwd/s")
    return train_sps, fwd_sps


def main():
    torch_train, torch_fwd = bench_torch()
    jax_train, jax_fwd = bench_jax()
    out = {
        "hardware": "same-host CPU (framework efficiency head-to-head)",
        "batch": BATCH,
        "size": SIZE,
        "torch_eager_train_steps_per_s": round(torch_train, 4),
        "torch_eager_sample_fwd_per_s": round(torch_fwd, 4),
        "jax_jit_train_steps_per_s": round(jax_train, 4),
        "jax_jit_sample_fwd_per_s": round(jax_fwd, 4),
        "efficiency_ratio_train": round(jax_train / torch_train, 3),
        "efficiency_ratio_sample": round(jax_fwd / torch_fwd, 3),
        "note": (
            "reference-equivalent torch-eager UNet (unet_ms.py architecture)"
            " vs our jax flagship, identical shapes, same CPU. bench.py"
            " projects the reference's A100 throughput from these measured"
            " ratios and published peak FLOP ratios."
        ),
    }
    (REPO / "BENCH_REFERENCE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
