from mymedialite_tpu.models.base import (  # noqa: F401
    FoldInItemRecommender, FoldInRatingPredictor, IncrementalItemRecommender,
    IncrementalRatingPredictor, ItemRecommender, IterativeModel, RatingPredictor,
    Recommender,
)
from mymedialite_tpu.models.registry import (  # noqa: F401
    create_item_recommender, create_rating_predictor,
    list_item_recommenders, list_rating_predictors,
)
