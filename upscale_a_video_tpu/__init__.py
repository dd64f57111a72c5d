"""upscale_a_video_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video super-resolution
framework with the capabilities of sczhou/Upscale-A-Video (CVPR 2024).

This is a from-scratch rebuild, not a port: video tensors are channels-last
``(B, T, H, W, C)``, the compute path is jit-compiled XLA with Pallas kernels for
the hot attention/norm ops, temporal windows are batched (not Python loops), and
multi-chip scaling is expressed with ``jax.sharding`` meshes rather than serial
chunk loops.

Subpackages
-----------
- ``sampling``  — DDIM split-step sampler + DDPM noising (ref: models_video/scheduling_ddim.py)
- ``nn``        — neural net building blocks (ref: models_video/{resnet,attention,unet_blocks,temporal_module}.py)
- ``models``    — UNetVideo, AutoencoderKLVideo, CLIP text encoder, RAFT, Propagation
- ``ops``       — Pallas/XLA kernels: flash attention, fused groupnorm, warp/grid-sample, resize
- ``pipeline``  — the VideoUpscalePipeline orchestrator, tiling, windows, color correction
- ``parallel``  — device-mesh helpers and sharded execution
- ``utils``     — host-side video IO, config loading, checkpoint conversion
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (avoids importing jax at package import)."""
    if name == "VideoUpscalePipeline":
        from .pipeline.pipeline import VideoUpscalePipeline
        return VideoUpscalePipeline
    if name == "load_pipeline":
        from .pipeline.loader import load_pipeline
        return load_pipeline
    if name == "UNetVideoModel":
        from .models.unet_video import UNetVideoModel
        return UNetVideoModel
    if name == "AutoencoderKLVideo":
        from .models.vae import AutoencoderKLVideo
        return AutoencoderKLVideo
    if name == "DDIMScheduler":
        from .sampling import DDIMScheduler
        return DDIMScheduler
    raise AttributeError(name)
