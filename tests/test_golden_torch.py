"""Golden-value tests against PyTorch ops (CPU torch is available).

The rebuild promises *math semantics* parity with the reference's torch
building blocks; these tests pin the numerics of our jnp implementations
against the exact torch ops the reference uses."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from diffusionmodelscustom_tpu.core.schedules import (  # noqa: E402
    cosine_beta_schedule,
    linear_beta_schedule,
)
from diffusionmodelscustom_tpu.ops.norms import instance_norm  # noqa: E402
from diffusionmodelscustom_tpu.ops.embeddings import (  # noqa: E402
    pos_encoding_block,
    sinusoidal_embedding,
)


def test_instance_norm_matches_torch():
    # torch nn.InstanceNorm2d defaults: affine=False, eps=1e-5
    # (modules_DANRA_conditional.py:412-419)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8, 8, 5)).astype(np.float32) * 4 + 2
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
    theirs = torch.nn.InstanceNorm2d(5)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_betas_match_torch_linspace():
    ours = np.asarray(linear_beta_schedule(800, 1e-4, 0.02))
    theirs = torch.linspace(1e-4, 0.02, 800).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-9)


def test_cosine_betas_match_torch_formula():
    # src/diffusion_modules.py:62-69 computed with torch ops
    T = 1000
    t = torch.linspace(0, T, T + 1)
    ft = torch.cos(((t / T + 0.008) / 1.008) * np.pi / 2) ** 2
    alphat = ft / ft[0]
    betat = torch.clip(1 - alphat[1:] / alphat[:-1], 0.0001, 0.9999)
    ours = np.asarray(cosine_beta_schedule(T))
    np.testing.assert_allclose(ours, betat.numpy(), rtol=3e-4, atol=1e-7)


def test_pos_encoding_matches_torch_loop():
    # Encoder.pos_encoding with n=1000 (modules_DANRA_conditional.py:203-211)
    dim = 32
    tt = torch.tensor([[3.0], [77.0], [799.0]])
    inv_freq = 1.0 / (1000 ** (torch.arange(0, dim, 2).float() / dim))
    pos_a = torch.sin(tt.repeat(1, dim // 2) * inv_freq)
    pos_b = torch.cos(tt.repeat(1, dim // 2) * inv_freq)
    theirs = torch.cat([pos_a, pos_b], dim=-1).numpy()
    ours = np.asarray(pos_encoding_block(jnp.array([3.0, 77.0, 799.0]), dim, n=1000.0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_sinusoidal_embedding_matches_torch_loop():
    # SinusoidalEmbedding forward loop (modules_DANRA_conditional.py:54-61)
    dim, n = 16, 10000
    vals = [0.0, 5.0, 123.0]
    theirs = torch.zeros((3, dim))
    for idx, v in enumerate(vals):
        for i in range(dim // 2):
            emb = torch.tensor(v / (n ** (2 * i / dim)))
            theirs[idx, 2 * i] = torch.sin(emb)
            theirs[idx, 2 * i + 1] = torch.cos(emb)
    ours = np.asarray(sinusoidal_embedding(jnp.asarray(vals), dim))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_q_sample_matches_torch_noise_image():
    # noiseImage math (diffusion_DANRA_conditional.py:85-103) with shared
    # inputs computed both ways
    from diffusionmodelscustom_tpu.core.ddpm import GaussianDiffusion

    T = 100
    diff = GaussianDiffusion.create(n_timesteps=T, scheduler="linear")
    betas_t = torch.linspace(1e-4, 0.02, T)
    alphas_t = 1 - betas_t
    alpha_hat_t = torch.cumprod(alphas_t, dim=0)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    t_idx = np.array([7, 42])

    ab = alpha_hat_t[torch.tensor(t_idx)].reshape(2, 1, 1, 1)
    theirs = (
        torch.sqrt(ab) * torch.tensor(x) + torch.sqrt(1 - ab) * torch.tensor(eps)
    ).numpy()
    ours = np.asarray(diff.q_sample(jnp.asarray(x), jnp.asarray(t_idx), jnp.asarray(eps)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_layernorm_attention_input_matches_torch():
    # the attention pre-norm (modules_DANRA_conditional.py:87,103)
    import jax
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 8)).astype(np.float32)
    ln = nn.LayerNorm()
    params = ln.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))
    theirs = torch.nn.LayerNorm(8)(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def test_multihead_attention_matches_torch_with_weight_transfer():
    """Our MultiHeadSelfAttention must reproduce torch
    nn.MultiheadAttention (the reference's attention core,
    modules_DANRA_conditional.py:89) bit-for-bit given the same weights."""
    import jax

    from diffusionmodelscustom_tpu.ops.attention import MultiHeadSelfAttention

    b, s, c, h = 2, 12, 16, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, s, c)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(c, h, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        want, _ = tmha(_t(x), _t(x), _t(x))
    want = want.numpy()

    ours = MultiHeadSelfAttention(n_heads=h, use_flash=False)
    params = {
        "params": {
            "qkv": {
                "kernel": jnp.asarray(
                    tmha.in_proj_weight.detach().numpy().T
                ),
                "bias": jnp.asarray(tmha.in_proj_bias.detach().numpy()),
            },
            "out": {
                "kernel": jnp.asarray(
                    tmha.out_proj.weight.detach().numpy().T
                ),
                "bias": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
            },
        }
    }
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decoder_block_matches_torch_mirror():
    """Full DecoderBlock golden (SURVEY C4 quirks: transpose-conv 2x ->
    InstanceNorm -> conv -> InstanceNorm -> +skip -> +t-emb -> attention
    -> ReLU) against a torch mirror built from the reference's documented
    semantics (modules_DANRA_conditional.py:349-460), with weights
    transferred torch -> flax."""
    import jax

    from diffusionmodelscustom_tpu.models.danra_unet import DecoderBlock
    from diffusionmodelscustom_tpu.ops.embeddings import sinusoidal_embedding

    b, hw, cin, cout, tdim, heads = 2, 6, 8, 8, 32, 2
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, hw, hw, cin)).astype(np.float32)
    skip = rng.standard_normal((b, hw * 2, hw * 2, cout)).astype(np.float32)
    tval = np.array([13, 501], np.int64)

    # ---- torch mirror -------------------------------------------------
    convT = torch.nn.ConvTranspose2d(cin, cin, 2, stride=2)
    conv = torch.nn.Conv2d(cin, cout, 3, padding=1)
    inorm = torch.nn.InstanceNorm2d(cin)
    inorm2 = torch.nn.InstanceNorm2d(cout)
    tproj = torch.nn.Linear(tdim, cout)
    ln = torch.nn.LayerNorm(cout)
    mha = torch.nn.MultiheadAttention(cout, heads, batch_first=True)
    for m in (convT, conv, tproj, mha):
        m.eval()

    def torch_sinusoidal(t, dim):
        out = np.zeros((len(t), dim), np.float32)
        for bi, tv in enumerate(t):
            for i in range(dim // 2):
                emb = tv / (10000 ** (2 * i / dim))
                out[bi, 2 * i] = np.sin(emb)
                out[bi, 2 * i + 1] = np.cos(emb)
        return out

    with torch.no_grad():
        xt = _t(x).permute(0, 3, 1, 2)
        o = convT(xt)
        o = inorm(o)
        o = conv(o)
        o = inorm2(o)
        o = o + _t(skip).permute(0, 3, 1, 2)
        temb = torch.nn.functional.silu(_t(torch_sinusoidal(tval, tdim)))
        temb = tproj(temb)
        o = o + temb[:, :, None, None]
        tokens = o.flatten(2).transpose(1, 2)  # (B, S, C)
        normed = ln(tokens)
        attn, _ = mha(normed, normed, normed)
        tokens = attn + tokens
        o = tokens.transpose(1, 2).reshape(b, cout, hw * 2, hw * 2)
        want = torch.relu(o).permute(0, 2, 3, 1).numpy()

    # ---- flax with transferred weights --------------------------------
    block = DecoderBlock(
        output_channels=cout, time_embedding=tdim, n_heads=heads,
        compute_attn=True,
    )
    # torch convT weight (in, out, kh, kw) -> flax (kh, kw, in, out);
    # flax ConvTranspose convention needs the kernel spatially FLIPPED
    # relative to torch (verified numerically)
    wT = np.ascontiguousarray(
        convT.weight.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    )
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    wC = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {
        "params": {
            "transpose": {
                "kernel": jnp.asarray(wT),
                "bias": jnp.asarray(convT.bias.detach().numpy()),
            },
            "conv": {
                "kernel": jnp.asarray(wC),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            },
            "time_proj": {
                "kernel": jnp.asarray(tproj.weight.detach().numpy().T),
                "bias": jnp.asarray(tproj.bias.detach().numpy()),
            },
            "attn": {
                "ln": {
                    "scale": jnp.asarray(ln.weight.detach().numpy()),
                    "bias": jnp.asarray(ln.bias.detach().numpy()),
                },
                "mha": {
                    "qkv": {
                        "kernel": jnp.asarray(
                            mha.in_proj_weight.detach().numpy().T
                        ),
                        "bias": jnp.asarray(mha.in_proj_bias.detach().numpy()),
                    },
                    "out": {
                        "kernel": jnp.asarray(
                            mha.out_proj.weight.detach().numpy().T
                        ),
                        "bias": jnp.asarray(mha.out_proj.bias.detach().numpy()),
                    },
                },
            },
        }
    }
    got = np.asarray(
        block.apply(
            params, jnp.asarray(x), jnp.asarray(skip), jnp.asarray(tval)
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Full-network golden: a torch mirror of the reference DiffusionNet (same
# module/attribute names as modules_DANRA_conditional.py, written here from
# the documented semantics) is randomly initialized, its state_dict imported
# through utils/torch_import, and the two full networks compared end to end.
# ---------------------------------------------------------------------------


class _TorchAttn(torch.nn.Module):
    def __init__(self, c, heads):
        super().__init__()
        self.layernorm = torch.nn.LayerNorm(c)
        self.attention = torch.nn.MultiheadAttention(c, heads, batch_first=True)

    def forward(self, x):  # NCHW
        n, c, h, w = x.shape
        tokens = x.reshape(n, c, h * w).permute(0, 2, 1)
        normed = self.layernorm(tokens)
        attn, _ = self.attention(normed, normed, normed)
        tokens = attn + tokens
        return tokens.permute(0, 2, 1).reshape(n, c, h, w)


class _TorchBasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


def _interleaved_sinusoidal(t, dim):
    out = torch.zeros(len(t), dim)
    for bi in range(len(t)):
        for i in range(dim // 2):
            emb = float(t[bi]) / (10000 ** (2 * i / dim))
            out[bi, 2 * i] = np.sin(emb)
            out[bi, 2 * i + 1] = np.cos(emb)
    return out


class _TorchEncoder(torch.nn.Module):
    def __init__(self, cin, tdim, heads, num_classes):
        super().__init__()
        self.tdim = tdim
        chans = [64, 64, 128, 256, 512]
        self.conv1 = torch.nn.Conv2d(cin, 64, 8, 2, 3, bias=False)
        self.conv2 = torch.nn.Conv2d(64, 64, 8, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        stage_cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for li, (ci, co, s) in enumerate(stage_cfg, start=1):
            blocks = [_TorchBasicBlock(ci, co, s), _TorchBasicBlock(co, co, 1)]
            setattr(self, f"layer{li}", torch.nn.Sequential(*blocks))
        self.label_emb = torch.nn.Embedding(num_classes, tdim)
        self.time_projection_layers = torch.nn.ModuleList(
            [
                torch.nn.Sequential(torch.nn.SiLU(), torch.nn.Linear(tdim, ch))
                for ch in chans
            ]
        )
        self.attention_layers = torch.nn.ModuleList(
            [_TorchAttn(ch, heads) for ch in chans]
        )

    def pos_encoding(self, t):
        inv_freq = 1.0 / (
            1000 ** (torch.arange(0, self.tdim, 2).float() / self.tdim)
        )
        tt = t.float().unsqueeze(-1)
        a = torch.sin(tt.repeat(1, self.tdim // 2) * inv_freq)
        b = torch.cos(tt.repeat(1, self.tdim // 2) * inv_freq)
        return torch.cat([a, b], dim=-1)

    def forward(self, x, t, y, cond_img, lsm, topo):
        x = torch.cat([x, lsm, topo, cond_img], dim=1)
        temb = self.pos_encoding(t) + self.label_emb(y)
        fmaps = []
        h = self.conv1(x)
        h = h + self.time_projection_layers[0](temb)[:, :, None, None]
        h = self.attention_layers[0](h)
        fmaps.append(h)
        h2 = torch.relu(self.bn1(self.conv2(h)))
        for i in range(1, 5):
            h2 = getattr(self, f"layer{i}")(h2)
            h2 = h2 + self.time_projection_layers[i](temb)[:, :, None, None]
            h2 = self.attention_layers[i](h2)
            fmaps.append(h2)
        return fmaps


class _TorchDecoderBlock(torch.nn.Module):
    def __init__(self, cin, cout, tdim, heads, compute_attn=True, final=False):
        super().__init__()
        self.tdim = tdim
        self.final = final
        self.transpose = torch.nn.ConvTranspose2d(cin, cin, 2, 2)
        self.conv = torch.nn.Conv2d(cin, cout, 3, 1, 1)
        self.instance_norm1 = torch.nn.InstanceNorm2d(cin)
        self.instance_norm2 = (
            torch.nn.Identity() if final else torch.nn.InstanceNorm2d(cout)
        )
        self.time_projection_layer = torch.nn.Sequential(
            torch.nn.SiLU(), torch.nn.Linear(tdim, cout)
        )
        self.attention = _TorchAttn(cout, heads) if compute_attn else torch.nn.Identity()

    def forward(self, fmap, prev=None, t=None):
        out = self.instance_norm2(self.conv(self.instance_norm1(self.transpose(fmap))))
        if prev is not None:
            out = out + prev
        if t is not None:
            temb = self.time_projection_layer(_interleaved_sinusoidal(t, self.tdim))
            out = out + temb[:, :, None, None]
            out = self.attention(out)
        return out if self.final else torch.relu(out)


class _TorchDiffusionNet(torch.nn.Module):
    def __init__(self, cin, cout, tdim, heads, num_classes):
        super().__init__()
        self.encoder = _TorchEncoder(cin, tdim, heads, num_classes)

        class Dec(torch.nn.Module):
            def __init__(self):
                super().__init__()
                plan = [(512, 256), (256, 128), (128, 64), (64, 64)]
                self.residual_layers = torch.nn.ModuleList(
                    [_TorchDecoderBlock(a, b, tdim, heads) for a, b in plan]
                )
                self.final_layer = _TorchDecoderBlock(
                    64, cout, tdim, heads, compute_attn=False, final=True
                )

            def forward(self, fmaps, t):
                rev = list(reversed(fmaps))
                out = self.residual_layers[0](rev[0], rev[1], t)
                for i in range(1, 4):
                    out = self.residual_layers[i](out, rev[i + 1], t)
                return self.final_layer(out)

        self.decoder = Dec()

    def forward(self, x, t, y, cond_img, lsm, topo):
        fmaps = self.encoder(x, t, y, cond_img, lsm, topo)
        return self.decoder(fmaps, t)


def test_full_diffusion_net_golden_via_checkpoint_import():
    """End-to-end: a reference-named torch DiffusionNet's state_dict is
    imported (utils/torch_import) and the full networks must agree."""
    import jax

    from diffusionmodelscustom_tpu.models import DiffusionNet
    from diffusionmodelscustom_tpu.utils.torch_import import (
        import_danra_torch_checkpoint,
    )

    torch.manual_seed(0)
    tnet = _TorchDiffusionNet(cin=4, cout=1, tdim=32, heads=2, num_classes=4)
    tnet.eval()

    rng = np.random.default_rng(0)
    b, hw = 2, 32
    x = rng.standard_normal((b, hw, hw, 1)).astype(np.float32)
    lsm = rng.standard_normal((b, hw, hw, 1)).astype(np.float32)
    topo = rng.standard_normal((b, hw, hw, 1)).astype(np.float32)
    cond = rng.standard_normal((b, hw, hw, 1)).astype(np.float32)
    tval = np.array([7, 542], np.int64)
    y = np.array([1, 3], np.int64)

    with torch.no_grad():
        want = (
            tnet(
                _t(x).permute(0, 3, 1, 2),
                torch.tensor(tval),
                torch.tensor(y),
                _t(cond).permute(0, 3, 1, 2),
                _t(lsm).permute(0, 3, 1, 2),
                _t(topo).permute(0, 3, 1, 2),
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )

    variables = import_danra_torch_checkpoint(
        {"network_params": tnet.state_dict()}
    )
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    ours = DiffusionNet(
        output_channels=1, time_embedding=32, n_heads=2, num_classes=4
    )
    got = np.asarray(
        ours.apply(
            variables,
            jnp.asarray(x),
            jnp.asarray(tval.astype(np.int32)),
            jnp.asarray(y.astype(np.int32)),
            jnp.asarray(cond),
            jnp.asarray(lsm),
            jnp.asarray(topo),
            train=False,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
