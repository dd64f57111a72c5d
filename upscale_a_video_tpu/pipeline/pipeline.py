"""VideoUpscalePipeline — the sampling orchestrator.

TPU-native rebuild of the reference pipeline
(`/root/reference/models_video/pipeline_upscale_a_video.py:61-717`). The
algorithm is identical (SURVEY §2.2); the execution model is not:

- The entire denoise loop is ONE jitted function: ``lax.scan`` over timesteps,
  with the temporal sliding windows gathered into a batch and executed by
  ``lax.map`` over window groups (compiled once), then recombined with a
  precomputed scatter-weight matrix that reproduces the reference's sequential
  0.5/0.5 overlap averaging exactly (see pipeline/windows.py).
- Flow-guided propagation runs inside the scan under ``lax.cond``, gated by a
  static per-step boolean mask (the `-p` list).
- Chunked VAE decode is a scanned jitted function (3-frame chunks,
  ref :685-700), fp32 by default as the reference forces (:666-681).
- All randomness comes from explicit threefry keys (seed-stable across runs
  and shardings), replacing torch generators.

Data layout: video tensors are channels-last (B, T, H, W, C) in [-1, 1].
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPTextModel
from ..models.propagation import propagate_latents
from ..models.unet_video import UNetVideoModel
from ..models.vae import AutoencoderKLVideo
from ..sampling import DDIMScheduler, DDPMScheduler
from .windows import chunk_starts, unique_window_plan


@dataclasses.dataclass(frozen=True)
class PABConfig:
    """Pyramid Attention Broadcast (PAPERS.md): reuse attention deltas across
    denoise steps. ``*_range`` = recompute every N steps inside
    [start_step, end_step); outside that window everything is computed. The
    paper's ordering (cross slowest, temporal, spatial fastest) is the default.
    """

    cross_range: int = 6
    spatial_range: int = 2
    temporal_range: int = 4
    start_step: int = 2
    end_step: int = 10**9  # default: until the end
    # UNet levels whose caches are NOT kept (those blocks recompute every
    # step). The finest level holds the most pixels — skipping it trades a
    # little speedup for a lot of HBM (the cache rides the whole denoise
    # scan). E.g. ("down_0", "up_3") on the released 4-level config.
    skip_levels: Tuple[str, ...] = ()
    # Attention kinds that are cached; the rest recompute every step. The
    # cross attentions have the longest reuse range (cross_range) and the
    # smallest per-delta HBM relative to their compute, so kinds=("cross",)
    # caches ALL levels within one chip's HBM where full-kind caching OOMs.
    kinds: Tuple[str, ...] = ("spatial", "cross", "temporal")

    def use_cached_flags(self, num_steps: int):
        """(steps,) bool arrays per attention kind: True = reuse cache."""
        steps = np.arange(num_steps)
        inside = (steps >= self.start_step) & (steps < self.end_step)

        def sched(rng):
            if rng <= 1:
                return np.zeros(num_steps, dtype=bool)
            recompute = (steps - self.start_step) % rng == 0
            return inside & ~recompute

        return {
            "cross": sched(self.cross_range),
            "spatial": sched(self.spatial_range),
            "temporal": sched(self.temporal_range),
        }


@dataclasses.dataclass
class PipelineModules:
    """Models + params bundle. ``tokenizer`` is any callable mapping
    List[str] -> int32 (B, 77) input ids (HF CLIPTokenizer works)."""

    unet: UNetVideoModel
    unet_params: Any
    vae: AutoencoderKLVideo
    vae_params: Any
    text_encoder: CLIPTextModel
    text_params: Any
    tokenizer: Any
    scheduler: DDIMScheduler
    low_res_scheduler: DDPMScheduler


class VideoUpscalePipeline:
    MAX_NOISE_LEVEL = 350  # ref pipeline_upscale_a_video.py:102

    def __init__(
        self,
        modules: PipelineModules,
        dtype=jnp.bfloat16,
        decode_dtype=jnp.float32,
        unet_window: int = 8,
        unet_stride: int = 6,
        decode_chunk: int = 3,
        window_group: int = 0,  # 0 = all windows in one batched UNet call
        pab: Optional[PABConfig] = None,
        cfg_prefix_share: Optional[bool] = None,
        step_mode: str = "scan",
    ):
        self.m = modules
        self.dtype = dtype
        self.decode_dtype = decode_dtype
        self.unet_window = unet_window
        self.unet_stride = unet_stride
        self.decode_chunk = decode_chunk
        self.window_group = window_group
        self.pab = pab
        # "scan": the whole denoise loop is ONE jitted lax.scan dispatch.
        # "host": jit ONE denoise step, Python-loop over the steps — the same
        # compiled program runs num_steps times with short device dispatches.
        # Numerically identical (tested); use "host" when a single dispatch
        # would exceed an execution watchdog (e.g. T=32 at 320² through the
        # axon tunnel) or to interleave host work between steps.
        if step_mode not in ("scan", "host"):
            raise ValueError(f"step_mode must be 'scan' or 'host', got {step_mode!r}")
        self.step_mode = step_mode
        # CFG shared-prefix (UNetVideoModel cfg_dup): run the text-independent
        # level-0 prefix once per window instead of twice. Exact (equivalence
        # tested); kill switch UAV_NO_CFG_PREFIX for A/B.
        if cfg_prefix_share is None:
            cfg_prefix_share = not os.environ.get("UAV_NO_CFG_PREFIX")
        self.cfg_prefix_share = cfg_prefix_share
        if pab is not None and window_group:
            raise ValueError("PAB requires the single batched-window path "
                             "(window_group=0)")
        self._offload = False
        self._denoise_cache = {}
        self._decode_cache = {}
        # NB: params are ARGUMENTS of every jitted function here, never
        # closures — closed-over arrays embed as HLO constants, which for
        # ~10⁹ parameters makes XLA compiles pathologically slow.
        self._encode_text = jax.jit(
            lambda params, ids: self.m.text_encoder.apply(params, ids)
        )

    # --------------------------------------------------------- offload

    def enable_model_offload(self, enabled: bool = True):
        """HBM-residency analog of the reference's accelerate CPU-offload
        hooks (pipeline_upscale_a_video.py:113-154): with offload on, each
        model's params live in host RAM and are staged into HBM only for its
        stage (UNet for the denoise scan, VAE for decode), freeing HBM for
        activations on large tiles/long clips."""
        self._offload = enabled
        if enabled:
            cpu = jax.devices("cpu")[0]
            self.m.unet_params = jax.device_put(self.m.unet_params, cpu)
            self.m.vae_params = jax.device_put(self.m.vae_params, cpu)

    def _stage_params(self, params):
        """Offload mode: copy params host→HBM for the stage; the caller drops
        the reference afterwards, freeing the HBM copy."""
        if not self._offload:
            return params
        return jax.device_put(params, jax.devices()[0])

    # ----------------------------------------------------------- text

    def encode_prompt(
        self,
        prompt: Sequence[str],
        negative_prompt: Optional[Sequence[str]],
        do_cfg: bool,
    ) -> jax.Array:
        """CLIP-encode prompts; CFG concat [uncond, cond]
        (ref :177-321, order fixed at :314-321)."""
        ids = jnp.asarray(self.m.tokenizer(list(prompt)))
        cond = self._encode_text(self.m.text_params, ids)
        if not do_cfg:
            return cond
        neg = negative_prompt if negative_prompt is not None else [""] * len(prompt)
        nids = jnp.asarray(self.m.tokenizer(list(neg)))
        uncond = self._encode_text(self.m.text_params, nids)
        return jnp.concatenate([uncond, cond], axis=0)

    # -------------------------------------------------------- denoise

    def _build_denoise(
        self,
        shape: Tuple[int, int, int, int],
        num_inference_steps: int,
        do_cfg: bool,
        guidance_scale: float,
        prop_mask: Tuple[bool, ...],
        has_flows: bool,
    ):
        """Compile one denoise program for a (B, T, H, W) geometry."""
        b, t, h, w = shape
        win = min(self.unet_window, t)
        # deduplicated plan: repeated right-aligned tail windows compute
        # identical outputs, so only unique windows run (exact; 5 instead of
        # 6 UNet calls/step at the flagship T=32 — windows.unique_window_plan)
        ustarts, ublend = unique_window_plan(t, self.unet_window, self.unet_stride)
        starts = np.asarray(ustarts)
        blend = jnp.asarray(ublend)
        n_win = len(starts)
        # (N, win) absolute frame indices per window
        win_idx = jnp.asarray(starts[:, None] + np.arange(win)[None, :])
        timesteps = jnp.asarray(self.m.scheduler.timesteps(num_inference_steps))
        prop_flags = jnp.asarray(np.asarray(prop_mask, dtype=bool))
        sched = self.m.scheduler
        unet = self.m.unet
        group = self.window_group if self.window_group > 0 else n_win

        pab = self.pab
        collect_struct = (
            unet.make_pab_collect_cache(
                skip=pab.skip_levels,
                kinds=(None if set(pab.kinds)
                       == {"spatial", "cross", "temporal"} else pab.kinds))
            if pab is not None else None)

        # CFG shared-prefix: pass each window's latents ONCE (batch n) with
        # ctx at 2n as [uncond-half, cond-half]; the UNet duplicates after
        # the text-free level-0 prefix (UNetVideoModel cfg_dup) — exact, and
        # saves the level-0 compute of one CFG branch.
        share = bool(do_cfg and self.cfg_prefix_share)

        def unet_on_windows(unet_params, latent_in, image_in, tstep, prompt_embeds,
                            denoise_level, attn_cache=None, flags=None):
            """latent_in/image_in: (Bc, T, H, W, C) → noise pred
            (2·Bc if share else Bc, T, H, W, 4) [+ new attention cache under
            PAB]. Under ``share``, image_in may arrive CFG-duplicated — only
            its first Bc rows are read."""
            bc = latent_in.shape[0]
            bc_out = 2 * bc if share else bc
            image_in = image_in[:bc]
            # gather windows: (Bc, N, win, H, W, C) → (N, Bc, win, H, W, C)
            lat_w = jnp.moveaxis(latent_in[:, win_idx], 0, 1)
            img_w = jnp.moveaxis(image_in[:, win_idx], 0, 1)

            def run_group(pair):
                lw, iw = pair  # (G, Bc, win, H, W, C)
                g = lw.shape[0]
                lw = lw.reshape(g * bc, win, h, w, lw.shape[-1])
                iw = iw.reshape(g * bc, win, h, w, iw.shape[-1])
                if share:
                    # [uncond×(g·bc), cond×(g·bc)] matching cfg_dup's
                    # concat-of-halves duplication order
                    u, c = jnp.split(prompt_embeds, 2, axis=0)
                    emb = jnp.concatenate(
                        [jnp.tile(u, (g, 1, 1)), jnp.tile(c, (g, 1, 1))])
                    lvl = jnp.tile(denoise_level[:bc], (g,))
                else:
                    emb = jnp.tile(prompt_embeds, (g, 1, 1))
                    lvl = jnp.tile(denoise_level, (g,))
                if attn_cache is not None:
                    out, cache = unet.apply(unet_params, lw, tstep, iw, emb, lvl,
                                            attn_cache=attn_cache, use_flags=flags,
                                            cfg_dup=share)
                else:
                    out = unet.apply(unet_params, lw, tstep, iw, emb, lvl,
                                     cfg_dup=share)
                    cache = None
                if share:
                    # (2·g·bc, ...) halves → per-window rows [uncond bc, cond bc]
                    out = out.reshape(2, g, bc, win, h, w, out.shape[-1])
                    out = jnp.moveaxis(out, 0, 1).reshape(
                        g, bc_out, win, h, w, out.shape[-1])
                else:
                    out = out.reshape(g, bc_out, win, h, w, out.shape[-1])
                if attn_cache is not None:
                    return out, cache
                return out

            new_cache = None
            if n_win % group == 0 and n_win > group:
                lat_g = lat_w.reshape(n_win // group, group, *lat_w.shape[1:])
                img_g = img_w.reshape(n_win // group, group, *img_w.shape[1:])
                preds = jax.lax.map(run_group, (lat_g, img_g))
                preds = preds.reshape(n_win, bc_out, win, h, w, -1)
            else:
                if attn_cache is not None:
                    preds, new_cache = run_group((lat_w, img_w))
                else:
                    preds = run_group((lat_w, img_w))
            # recombine with the overlap-average weights:
            # out[b, t] = Σ_{n,k} blend[n,k,t] · preds[n,b,k]
            out = jnp.einsum("nkt,nbkhwc->bthwc", blend, preds)
            if attn_cache is not None:
                return out, new_cache
            return out

        if pab is not None:
            flag_arrays = pab.use_cached_flags(num_inference_steps)
            pab_flags = {k: jnp.asarray(v) for k, v in flag_arrays.items()}

        def make_body(unet_params, image_noised, prompt_embeds,
                      denoise_level, flows_f, flows_b):
            def body(carry, step_in):
                if pab is not None:
                    lat, cache = carry
                    tstep, do_prop, f_cross, f_spatial, f_temporal = step_in
                    flags = {"cross": f_cross, "spatial": f_spatial,
                             "temporal": f_temporal}
                else:
                    lat = carry
                    tstep, do_prop = step_in
                latent_in = (jnp.concatenate([lat, lat])
                             if do_cfg and not share else lat)
                if pab is not None:
                    noise_pred, cache = unet_on_windows(
                        unet_params, latent_in.astype(self.dtype), image_noised,
                        tstep, prompt_embeds, denoise_level, cache, flags,
                    )
                else:
                    noise_pred = unet_on_windows(
                        unet_params, latent_in.astype(self.dtype), image_noised,
                        tstep, prompt_embeds, denoise_level,
                    )
                noise_pred = noise_pred.astype(jnp.float32)
                if do_cfg:
                    uncond, cond = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (cond - uncond)
                x0 = sched.step_v0(noise_pred, tstep, lat)
                if has_flows:
                    x0 = jax.lax.cond(
                        do_prop,
                        lambda v: propagate_latents(v, flows_f, flows_b),
                        lambda v: v,
                        x0,
                    )
                lat = sched.step_vt(x0, noise_pred, tstep, lat, num_inference_steps)
                if pab is not None:
                    return (lat, cache), ()
                return lat, ()

            return body

        def init_cache(unet_params, batch, prompt_embeds, denoise_level):
            """Zero-init PAB cache with the collected structure's shapes."""
            cache_shapes = jax.eval_shape(
                lambda p, l, i, e, lv: unet.apply(
                    p, l, jnp.int32(0), i, e, lv,
                    attn_cache=collect_struct,
                    use_flags={"cross": False, "spatial": False,
                               "temporal": False})[1],
                unet_params,
                jnp.zeros((n_win * batch * (2 if do_cfg else 1),
                           win, h, w, 4), self.dtype),
                jnp.zeros((n_win * batch * (2 if do_cfg else 1),
                           win, h, w, 3), self.dtype),
                jnp.tile(prompt_embeds, (n_win, 1, 1)),
                jnp.tile(denoise_level, (n_win,)),
            )
            return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                cache_shapes)

        if self.step_mode == "host":
            # One jitted denoise STEP; the loop over steps runs on the host.
            # Each device dispatch covers one step's windows — bounded at
            # ~n_win·t_window regardless of num_inference_steps, which keeps
            # long clips under per-dispatch execution watchdogs.
            def one_step(unet_params, carry, image_noised, prompt_embeds,
                         denoise_level, flows_f, flows_b, step_in):
                body = make_body(unet_params, image_noised, prompt_embeds,
                                 denoise_level, flows_f, flows_b)
                new_carry, _ = body(carry, step_in)
                return new_carry

            step_jit = jax.jit(one_step, donate_argnums=(1,))
            ts_np = np.asarray(timesteps)
            pf_np = np.asarray(prop_flags)
            if pab is not None:
                fa_np = {k: np.asarray(v)
                         for k, v in pab.use_cached_flags(num_inference_steps).items()}

            def run_host(unet_params, latents, image_noised, prompt_embeds,
                         denoise_level, flows_f, flows_b, progress_cb=None):
                if pab is not None:
                    carry = (latents, init_cache(unet_params, latents.shape[0],
                                                 prompt_embeds, denoise_level))
                else:
                    carry = latents
                for i in range(num_inference_steps):
                    step_in = (ts_np.dtype.type(ts_np[i]), np.bool_(pf_np[i]))
                    if pab is not None:
                        step_in += (np.bool_(fa_np["cross"][i]),
                                    np.bool_(fa_np["spatial"][i]),
                                    np.bool_(fa_np["temporal"][i]))
                    carry = step_jit(unet_params, carry, image_noised,
                                     prompt_embeds, denoise_level,
                                     flows_f, flows_b, step_in)
                    if progress_cb is not None:
                        # make the tick truthful: force completion of this
                        # step (dispatches are async; a scalar readback is
                        # the reliable sync through the axon tunnel)
                        lat_i = carry[0] if pab is not None else carry
                        np.asarray(jax.device_get(lat_i[(0,) * lat_i.ndim]))
                        progress_cb("denoise", i + 1, num_inference_steps)
                return carry[0] if pab is not None else carry

            # expose the per-step jitted program for AOT tooling (the
            # compile-time peak-HBM gate lowers it without running —
            # scripts/hbm_gate.py)
            run_host._step_jit = step_jit
            return run_host

        def denoise(unet_params, latents, image_noised, prompt_embeds,
                    denoise_level, flows_f, flows_b):
            body = make_body(unet_params, image_noised, prompt_embeds,
                             denoise_level, flows_f, flows_b)
            if pab is not None:
                cache0 = init_cache(unet_params, latents.shape[0],
                                    prompt_embeds, denoise_level)
                xs = (timesteps, prop_flags, pab_flags["cross"],
                      pab_flags["spatial"], pab_flags["temporal"])
                (latents, _), _ = jax.lax.scan(body, (latents, cache0), xs)
                return latents

            latents, _ = jax.lax.scan(body, latents, (timesteps, prop_flags))
            return latents

        # donate the latent buffer: the scan carry reuses its HBM allocation
        return jax.jit(denoise, donate_argnums=(1,))

    # --------------------------------------------------------- decode

    def _build_decode(self, chunk_frames: int, w_lr: float):
        vae = self.m.vae
        scaling = self.m.vae.config.scaling_factor
        cond = self.m.vae.config.condition_img
        ddt = self.decode_dtype

        def decode(vae_params, latents, image_dec):
            z = (latents / scaling).astype(ddt)
            img = image_dec.astype(ddt) if cond else None
            out = vae.apply(
                vae_params, z, method=vae.decode,
                img=img, w_lr=w_lr,
            )
            return jnp.clip(out, -1.0, 1.0)  # ref decode_latents_vsr :350-354

        return jax.jit(decode)

    def decode_latents(self, latents: jax.Array, image_dec: jax.Array,
                       w_lr: float = 1.0, progress_cb=None) -> jax.Array:
        """Chunked conditional decode (ref :683-702)."""
        t = latents.shape[1]
        vae_params = self._stage_params(self.m.vae_params)
        outs = []
        chunks = chunk_starts(t, self.decode_chunk)
        for k, (s, e) in enumerate(chunks):
            key = (e - s, float(w_lr))
            if key not in self._decode_cache:
                self._decode_cache[key] = self._build_decode(e - s, w_lr)
            outs.append(self._decode_cache[key](
                vae_params, latents[:, s:e], image_dec[:, s:e]))
            if progress_cb is not None:
                np.asarray(jax.device_get(outs[-1][0, 0, 0, 0]))
                progress_cb("decode", k + 1, len(chunks))
        out = jnp.concatenate(outs, axis=1)
        if self._offload:
            out.block_until_ready()
            del vae_params
        return out

    # --------------------------------------------------------- validation

    def check_inputs(self, prompt, image, noise_level, negative_prompt):
        """Input validation (ref check_inputs :356-418)."""
        if prompt is not None and not isinstance(prompt, (str, list)):
            raise ValueError(f"`prompt` must be str or list, got {type(prompt)}")
        if negative_prompt is not None and not isinstance(negative_prompt, (str, list)):
            raise ValueError(
                f"`negative_prompt` must be str or list, got {type(negative_prompt)}")
        if image is None:
            raise ValueError("`image` input cannot be undefined")
        if getattr(image, "ndim", None) != 5:
            raise ValueError(
                f"`image` must be (B, T, H, W, 3), got shape {getattr(image, 'shape', None)}")
        if image.shape[-1] != 3:
            raise ValueError(f"`image` must be channels-last RGB, got {image.shape}")
        if noise_level > self.MAX_NOISE_LEVEL:
            raise ValueError(
                f"`noise_level` has to be <= {self.MAX_NOISE_LEVEL} but is {noise_level}")
        if isinstance(prompt, list) and image.shape[0] != len(prompt):
            raise ValueError(
                f"batch mismatch: {len(prompt)} prompts vs {image.shape[0]} clips")

    # --------------------------------------------------------- __call__

    def __call__(
        self,
        prompt,
        image: jax.Array,                     # (B, T, H, W, 3) in [-1, 1]
        flows_bi: Optional[Tuple[jax.Array, jax.Array]] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 6.0,
        noise_level: int = 120,
        negative_prompt=None,
        propagation_steps: Sequence[int] = (),
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        lr_noise: Optional[jax.Array] = None,
        w_lr: float = 1.0,
        return_latents: bool = False,
        progress_cb=None,
    ):
        """Mirror of the reference __call__ (ref :436-717). Returns images
        (B, T, 4H, 4W, 3) in [-1, 1]."""
        self.check_inputs(prompt, image, noise_level, negative_prompt)
        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt]
        if key is None:
            key = jax.random.PRNGKey(10)  # driver's fixed seed (ref :197)

        b, t, h, w, _ = image.shape
        do_cfg = guidance_scale > 1.0

        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)

        image_dec = image.astype(jnp.float32)  # fp32 copy for the decoder (ref :542)
        image = image.astype(self.dtype)

        # noise the LR input at `noise_level` (ref :545-551); ``lr_noise``
        # injects the draw explicitly — the determinism seam the torch-parity
        # harness uses to run both frameworks on identical noise (RNG streams
        # cannot match across torch/threefry)
        key, nkey, lkey = jax.random.split(key, 3)
        if lr_noise is None:
            noise = jax.random.normal(nkey, image.shape, jnp.float32)
        else:
            noise = lr_noise.astype(jnp.float32)
        noised = self.m.low_res_scheduler.add_noise(
            image.astype(jnp.float32), noise, jnp.full((b,), noise_level)
        ).astype(self.dtype)
        batch_mult = 2 if do_cfg else 1
        image_noised = jnp.concatenate([noised] * batch_mult, axis=0)
        denoise_level = jnp.full((batch_mult * b,), noise_level, dtype=jnp.int32)

        # init latents at LR spatial size (ref prepare_latents_3d :421-432)
        latent_ch = self.m.vae.config.latent_channels
        if latents is None:
            latents = jax.random.normal(lkey, (b, t, h, w, latent_ch), jnp.float32)
        latents = latents * self.m.scheduler.init_noise_sigma

        prop_mask = tuple(
            i in set(propagation_steps) for i in range(num_inference_steps)
        )
        has_flows = flows_bi is not None and any(prop_mask)
        if has_flows:
            flows_f, flows_b = flows_bi
        else:
            # dummy, never read (lax.cond still requires consistent args)
            flows_f = jnp.zeros((b, max(t - 1, 1), 1, 1, 2), jnp.float32)
            flows_b = flows_f

        cache_key = (
            (b, t, h, w), num_inference_steps, do_cfg, float(guidance_scale),
            prop_mask if has_flows else (False,) * num_inference_steps, has_flows,
            self.step_mode, self.window_group,
        )
        if cache_key not in self._denoise_cache:
            self._denoise_cache[cache_key] = self._build_denoise(
                (b, t, h, w), num_inference_steps, do_cfg, float(guidance_scale),
                prop_mask if has_flows else (False,) * num_inference_steps, has_flows,
            )
        unet_params = self._stage_params(self.m.unet_params)
        if self.step_mode == "host":
            # per-step progress ticks (live: each dispatch is one step)
            latents = self._denoise_cache[cache_key](
                unet_params, latents, image_noised, prompt_embeds,
                denoise_level, flows_f, flows_b, progress_cb=progress_cb,
            )
        else:
            latents = self._denoise_cache[cache_key](
                unet_params, latents, image_noised, prompt_embeds,
                denoise_level, flows_f, flows_b
            )
            if progress_cb is not None:
                progress_cb("denoise", num_inference_steps, num_inference_steps)
        if self._offload:
            latents.block_until_ready()
            del unet_params

        images = self.decode_latents(latents, image_dec, w_lr,
                                     progress_cb=progress_cb)
        if return_latents:
            return images, latents
        return images
