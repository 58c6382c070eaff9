from challenge_tpu.utils.windows import seq_to_windows, windows_to_seq  # noqa: F401
from challenge_tpu.utils.io import load_data, list_to_generator  # noqa: F401
from challenge_tpu.utils.predict import predict  # noqa: F401
