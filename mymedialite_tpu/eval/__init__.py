from mymedialite_tpu.eval.rating import compute_fit, evaluate_ratings  # noqa: F401
from mymedialite_tpu.eval.ranking import (  # noqa: F401
    candidates_for_mode, evaluate_items,
)
from mymedialite_tpu.eval.results import (  # noqa: F401
    EvaluationResults, ItemRecommendationResults, RatingPredictionResults,
)
