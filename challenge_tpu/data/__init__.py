from challenge_tpu.data.specset import SpecBank, build_bank, remap_labels  # noqa: F401
from challenge_tpu.data.mixture import merge_complex_specs, sample_batch, Banks  # noqa: F401
from challenge_tpu.data.labels import (  # noqa: F401
    to_frame_labels, to_density_labels, label_downsample, preprocess_labels,
    multiply_label, mono_chan, stereo_mono, speech_enhancement_preprocess,
)
from challenge_tpu.data.pipeline import (  # noqa: F401
    DevicePipeline, build_banks, make_feature_fn, make_pipeline,
)
from challenge_tpu.data.streaming import (  # noqa: F401
    StreamingBanks, build_streaming_banks,
)
