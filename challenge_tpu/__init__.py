"""challenge_tpu — a TPU-native JAX framework for drone-audio sound event detection.

A ground-up rebuild of the capabilities of IRIS-AUDIO/challenge (AI Grand
Challenge track-3 stack) designed for TPU hardware:

* the entire data path (mixture synthesis, STFT features, SpecAugment) runs on
  device inside one XLA program — no host-side tf.data stage;
* STFT and mel projection are expressed as GEMMs so they land on the MXU;
* training is a single jitted step (synthesis -> features -> model -> AGC ->
  optimizer -> SWA) data-parallel over a `jax.sharding.Mesh`;
* evaluation is batched sliding-window inference with on-device overlap-add.

Reference parity targets are cited per-module as /root/reference/<file>:<line>.
"""

__version__ = "0.1.0"

EPSILON = 1e-8  # reference: utils.py:6, transforms.py:7


def _host_cache_fingerprint() -> str:
    """Fingerprint of the host's CPU feature set (plus ISA), used to
    namespace the persistent compilation cache per host *capability*.

    XLA:CPU AOT executables embed the compiling machine's CPU features;
    reusing one on a host missing any of them is a latent SIGILL
    (xla cpu_aot_loader checks at load time and warns: "Compile machine
    features ... vs host machine features ... could lead to execution
    errors such as SIGILL"). A shared-home cache dir reused across
    heterogeneous hosts therefore needs one namespace per feature set —
    hosts with identical features still share, every other pairing gets a
    clean (cold) namespace instead of a hazard."""
    import hashlib
    import platform
    feats = platform.machine()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                # x86 exposes 'flags', arm64 'Features'
                if line.split(':')[0].strip() in ('flags', 'Features'):
                    feats += ' ' + ' '.join(
                        sorted(line.split(':', 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def _enable_persistent_compile_cache():
    """TPU compiles of the fused programs take minutes; the persistent cache
    drops repeat cold-starts to seconds. Respects an explicit user setting.
    The directory is keyed by the host's CPU-feature fingerprint so XLA:CPU
    AOT artifacts never cross hosts with differing feature sets (see
    :func:`_host_cache_fingerprint`)."""
    import os
    if os.environ.get('JAX_COMPILATION_CACHE_DIR') or \
            os.environ.get('CHALLENGE_TPU_NO_COMPILE_CACHE'):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.path.join(
                os.path.expanduser('~'), '.cache', 'challenge_tpu_jax',
                _host_cache_fingerprint())
            os.makedirs(cache, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass


_enable_persistent_compile_cache()

from challenge_tpu.config import Config  # noqa: E402,F401
