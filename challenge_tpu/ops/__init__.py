"""Numeric ops: DSP frontend, mel projection, spectrogram transforms, augment.

Everything here is a pure, jittable function of arrays (+ explicit PRNG keys
for the random ops), designed so XLA can fuse the whole feature chain into the
training step. Heavy lifting (DFT, mel projection) is phrased as GEMMs for the
TPU MXU.
"""

from challenge_tpu.ops.dsp import (  # noqa: F401
    load_wav, load_wav_device, read_wav, resample_waveform, resample_matrix,
    rms_normalize, stft, stft_magnitude, wav_to_spec,
)
from challenge_tpu.ops.mel import (  # noqa: F401
    linear_to_mel_weight_matrix, magphase_to_mel, mel_filterbank,
)
from challenge_tpu.ops.complexspec import (  # noqa: F401
    complex_to_magphase, magphase_to_complex, log_magphase,
    minmax_norm_magphase, phase_vocoder,
)
from challenge_tpu.ops.norms import (  # noqa: F401
    EPSILON, LOG_EPSILON, safe_div, minmax, log_on_mel, minmax_log_on_mel,
)
from challenge_tpu.ops.augment import (  # noqa: F401
    batch_mask, batch_specaugment, mask, random_shift, random_merge_aug,
    stft_filter, specaugment,
)
