"""ihpr_tpu — TPU-native Integral Human Pose Regression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Phonicavi/Integral-Human-Pose-Regression-for-3D-Human-Pose-Estimation``
(Sun et al., *Integral Human Pose Regression*, ECCV 2018):

- ResNet backbone (18/34/50/101/152) + 3-layer deconv head emitting per-joint
  ``D x H x W`` heatmap volumes (reference: ``main/model.py``,
  ``common/nets/resnet.py``).
- Soft-argmax integral (volumetric softmax + x/y/z expectation) as a single
  fused Pallas TPU kernel with a custom VJP (reference:
  ``common/nets/loss.py:soft_argmax`` — there, three separate reductions).
- jit-compiled on-device crop/warp/augment input pipeline (reference:
  ``data/dataset.py`` — there, cv2 on CPU worker processes).
- SPMD data-parallel training over a ``jax.sharding.Mesh`` (reference:
  ``nn.DataParallel`` single-process GPU scatter/gather).

Package layout:
    config    — frozen dataclass configs (reference: main/config.py singleton)
    ops       — integral soft-argmax (JAX + Pallas), losses
    models    — Flax ResNet backbone, deconv head, PoseNet assembly
    data      — geometry, on-device warp/augment, datasets, input pipeline
    parallel  — mesh construction, sharded train/eval steps
    engine    — Trainer/Tester, checkpointing, logging, timers
    utils     — visualization, misc
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache: compiles on this platform go
    through a remote helper and cost minutes (R50 train step ~30-400s);
    caching makes every process after the first start instantly.
    Opt out with IHPR_NO_COMPILATION_CACHE=1."""
    import os

    if os.environ.get("IHPR_NO_COMPILATION_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "ihpr_jax_cache"),
        )
        # Scope the cache by host CPU identity: XLA:CPU entries are AOT
        # executables specialized to the COMPILING machine's ISA features;
        # loading one on a host with fewer features can SIGILL mid-run
        # (observed: a cache populated elsewhere crashed the 8-virtual-
        # device CPU dryrun). TPU entries re-compile once per new host —
        # cheap insurance against a poisoned cross-machine cache.
        try:
            import hashlib
            import platform

            # Hash the full CPU identity, not just the feature flags:
            # LLVM picks per-model tuning features (prefer-no-scatter,
            # AMX subsets, ...) from the detected CPU MODEL, so two hosts
            # with identical cpuinfo `flags` lines can still produce
            # mutually incompatible XLA:CPU AOT artifacts (observed:
            # feature-mismatch warnings loading a foreign entry whose
            # flags-line hash collided with this host's).
            # "bugs"/"microcode" matter too: LLVM's prefer-no-gather/
            # -scatter tuning follows the gather-data-sampling (Downfall)
            # mitigation state, which differs between same-model hosts and
            # lives in those lines, not in `flags` (observed: foreign AOT
            # entries loading with exactly that feature mismatch).
            keep = (
                "flags", "model name", "model", "cpu family", "stepping",
                "bugs", "microcode",
            )
            ident = []
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.split("\t", 1)[0].strip() in keep:
                        ident.append(line.strip())
                    if len(ident) >= len(keep):
                        break
            fp = hashlib.sha1(
                (platform.machine() + "|".join(sorted(set(ident)))).encode()
            ).hexdigest()[:10]
            cache_dir = os.path.join(cache_dir, f"host_{fp}")
        except OSError:
            pass
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_compilation_cache()
