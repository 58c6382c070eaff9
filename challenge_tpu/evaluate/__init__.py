"""Evaluation: sliding-window inference, event extraction, challenge ER
(reference: metrics.py:31-214, eval.py)."""

from challenge_tpu.evaluate.events import (  # noqa: F401
    Challenge_Metric, ChallengeMetric, extract_middle, get_er,
    get_second_answer, get_start_end_frame, get_start_end_time,
    output_to_metric, second2frame,
)
from challenge_tpu.evaluate.infer import (  # noqa: F401
    evaluate, frame_signal, make_infer_fn, overlap_and_add,
)
