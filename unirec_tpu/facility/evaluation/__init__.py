from unirec_tpu.facility.evaluation.evaluators import (  # noqa: F401
    MultiPositiveEvaluator,
    OnePositiveEvaluator,
    SessionWiseEvaluator,
    build_evaluator,
)
