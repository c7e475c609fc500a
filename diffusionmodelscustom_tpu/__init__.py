"""diffusionmodelscustom_tpu — a TPU-native diffusion-model framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference collection ``TheaQG/DiffusionModelsCustom``: DDPM training and
sampling for climate-field generation and downscaling (DANRA fields
conditioned on ERA5 low-resolution inputs, land-sea masks, topography,
signed-distance fields, season labels), plus an Imagen-style cascaded DDPM
(base + super-resolution UNets, T5 text conditioning, elucidated EDM
sampler) — all designed TPU-first:

* compute path: ``jax.jit`` everything; NHWC convs on the MXU in bfloat16;
  attention as a fused Pallas flash-attention kernel; the 1000-step reverse
  diffusion loop as a single ``jax.lax.scan`` with a jit-fused step.
* scaling: SPMD over a ``jax.sharding.Mesh`` (``data`` axis over ICI/DCN for
  batch parallelism, ``model`` axis for fsdp-style parameter sharding);
  collectives are emitted by XLA from sharding annotations.
* host path: chunked-array datasets with prefetch, EDT/SDF precompute.

Layer map (mirrors SURVEY.md section 1, rebuilt as real layers):

    cli/          entry points (train / generate / evaluate / imagen)
    train/        Trainer, train state, optimizers, EMA
    sampling/     ancestral (lax.scan), DDIM, EDM churn samplers
    core/         diffusion math: schedules, q_sample, losses, CFG, EDM
    models/       UNet family (DANRA parity net, perf UNet, Imagen cascade)
    ops/          embeddings, attention (Pallas), norm kernels
    data/         zarr-lite store, DANRA datasets, SDF/geo preprocessing
    parallel/     mesh construction + sharding helpers
    evaluation/   ocean-masked MAE/RMSE, CRPS, distribution metrics
    utils/        checkpointing (orbax), config tree
"""

__version__ = "0.1.0"
