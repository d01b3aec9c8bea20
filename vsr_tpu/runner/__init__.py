from vsr_tpu.runner import trainers as trainers  # noqa: F401
from vsr_tpu.runner import predictors as predictors  # noqa: F401
