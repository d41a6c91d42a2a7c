"""Headline benchmark: depth-maps/sec/chip at DTU 640x512, 3 views.

Prints ONE JSON line per measured batch size; the LAST line is the final
summary {"metric", "value", "unit", "vs_baseline"} (the driver parses the
tail, so every intermediate line is a valid fallback summary carrying the
best-so-far value).

Robustness contract (round-4 fix for the r3 rc=124 artifact): batch 1 is
measured FIRST and its summary printed IMMEDIATELY, so a later batch that
hangs or blows the remote compiler can no longer destroy the artifact.
The sweep self-bounds with a wall-clock budget: remaining batches are
skipped once elapsed time passes BUDGET_S.

Baseline derivation (the reference never benchmarks this exact config):
its notebook measures 0.756 s/view on an RTX 2080Ti at 1152x864 x 5 views
(/root/reference/test.ipynb cell 8). Scaling by pixel count (3.04x) and the
source-view count in the dominant warp/cost path ((5-1)/(3-1) = 2x feature
volume work, partially amortized) gives ~0.25 s/view at 640x512 x 3 views,
i.e. ~4.0 maps/s on the 2080Ti. vs_baseline = measured / 4.0 (so the
>= 10x north star in BASELINE.md corresponds to vs_baseline >= 10).

Timing methodology: the TPU runtime in this environment is asynchronous
(block_until_ready returns at enqueue) and host<->device transfers ride a
slow tunnel, so the model is run inside ONE jitted fori_loop with a
serializing data dependency and timed by differencing two iteration counts
(casmvsnet_pl_tpu/utils/devtime.py). Validated against MXU peak: a 4096^3
bf16 matmul measures 197 TFLOP/s on v5e.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 4.0          # RTX 2080Ti estimate, see module docstring
# Wall-clock budget for the whole sweep. The driver runs with the default;
# cache-warming runs (which must compile ALL batch sizes so the driver's
# budget survives on warm executables) override it via the env var.
BUDGET_S = float(os.environ.get("CASMVS_BENCH_BUDGET_S", "300"))


def make_inputs(batch: int, H: int, W: int, n_views: int):
    """Realistic inputs: the synthetic plane scene at bench resolution."""
    from casmvsnet_pl_tpu.data.synthetic import PlaneScene
    scene = PlaneScene(img_wh=(W, H), n_views=n_views, z0=460.0,
                       baseline=12.0, focal=600.0, slope_x=0.2)
    imgs, proj, _ = scene.model_inputs()
    imgs = np.repeat(imgs, batch, axis=0)
    proj = np.repeat(proj, batch, axis=0)
    return imgs, proj


def emit(best: float) -> None:
    """Print a summary JSON line; the driver parses the LAST such line."""
    print(json.dumps({
        "metric": "depth_maps_per_sec_per_chip_640x512_3views",
        "value": round(best, 3),
        "unit": "maps/s",
        "vs_baseline": round(best / BASELINE_MAPS_PER_SEC, 3),
    }), flush=True)


def bench_forward(batch: int = 2, H: int = 512, W: int = 640,
                  n_views: int = 3, iters: int = 16, groups: int = 1,
                  _cache={}):
    import jax
    import jax.numpy as jnp
    from casmvsnet_pl_tpu.models import CascadeMVSNet
    from casmvsnet_pl_tpu.utils.devtime import device_time

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    imgs_np, proj_np = make_inputs(batch, H, W, n_views)
    # One model + one set of variables for the whole sweep: params are
    # batch-independent and re-init would re-compile through the slow
    # remote compiler for every batch size.
    if "model" not in _cache:
        _cache["model"] = CascadeMVSNet(dtype=dtype, num_groups=groups,
                                        remat=False)
        # Init on the host CPU backend, then ship the (small) params once:
        # eager init on the TPU costs ~300 s of tunnel round trips
        # (utils/init.py).
        from casmvsnet_pl_tpu.utils import init_on_cpu
        _cache["vars"] = init_on_cpu(
            _cache["model"], jax.random.PRNGKey(0),
            imgs_np[:1, :, :64, :64], proj_np[:1], 425.0, 2.65)
    imgs, proj = jnp.asarray(imgs_np), jnp.asarray(proj_np)
    model, variables = _cache["model"], _cache["vars"]

    def forward(imgs, proj):
        # Batch >= 4 runs the batch-chunked forward: per-sample working
        # sets stay VMEM-resident instead of spilling to the HBM stream,
        # which costs ~20%/map at batch 4 (PERF_NOTES "Batch scaling";
        # measured 23.44 -> 29.39 maps/s).
        if batch >= 4:
            from casmvsnet_pl_tpu.models import chunked_apply
            out = chunked_apply(model, variables, imgs, proj, 425.0, 2.65,
                                chunk=1)
        else:
            out = model.apply(variables, imgs, proj, 425.0, 2.65)
        return out["depth_0"], out["confidence_2"]

    dt = device_time(forward, imgs, proj, iters=iters)
    return batch / max(dt, 1e-9)


def main():
    import os
    import jax
    # Persistent compilation cache: the remote TPU compiler in this
    # environment takes minutes-to-tens-of-minutes for the full cascade,
    # which is what timed out the round-3 artifact. Executable
    # serialization works through the axon tunnel (verified: cold 0.95 s /
    # warm 0.07 s on a probe shape), so a bench run that follows any
    # earlier run of the same code finishes its compiles in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_tpu_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 10 s floor: TPU cascade graphs take minutes and always cache, while
    # XLA:CPU side executables (host constant folding etc.) compile in
    # well under 10 s and must NOT enter the shared cache — CPU AOT
    # results pin the compiling host's feature set and cpu_aot_loader
    # warns of SIGILL when any other machine loads them (VERDICT r4).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    on_tpu = jax.default_backend() == "tpu"
    t0 = time.time()
    best = 0.0
    if on_tpu:
        # Device-state check: fresh-process throughput is BIMODAL on this
        # chip (modal 31.0 maps/s, occasional runs at ~34.5 from the SAME
        # cached executables — see PERF_NOTES "Current headline"). An MXU
        # reference measurement tags which mode produced this artifact.
        try:
            import jax.numpy as jnp
            from casmvsnet_pl_tpu.utils.devtime import device_time
            a = jnp.ones((4096, 4096), jnp.bfloat16)
            dt = device_time(lambda a: a @ a, a, iters=32)
            print(f"bench: MXU reference {2 * 4096**3 / dt / 1e12:.0f} "
                  f"TFLOP/s bf16 (197 = modal)", file=sys.stderr)
        except Exception as e:                      # never block the sweep
            print(f"bench: MXU reference skipped: {e!r}", file=sys.stderr)
        for batch in (1, 4, 8):      # batch 16 overflows the remote compiler
            elapsed = time.time() - t0
            if best > 0.0 and elapsed > BUDGET_S:
                print(f"bench: budget exhausted ({elapsed:.0f}s), "
                      f"skipping batch>={batch}", file=sys.stderr)
                break
            try:
                mps = bench_forward(batch=batch)
            except Exception as e:
                print(f"bench batch={batch} failed: {e!r}", file=sys.stderr)
                break
            print(f"bench batch={batch}: {mps:.2f} maps/s", file=sys.stderr)
            best = max(best, mps)
            emit(best)               # last line wins; never lose batch 1
    else:
        # CPU smoke mode: tiny shapes, not a performance statement
        best = bench_forward(batch=1, H=64, W=64, iters=3)
        emit(best)


if __name__ == "__main__":
    main()
