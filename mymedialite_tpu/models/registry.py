"""Explicit model registry.

Replaces the reference's reflection-driven factory
(``Extensions.CreateRatingPredictor/CreateItemRecommender/
ListRecommenders``, ``Extensions.cs:170-244,292-312``) with explicit
dictionaries. Model names match the reference class names so CLI
invocations are drop-in compatible.
"""

from __future__ import annotations

import importlib

# name -> "module:Class"; imported lazily so importing the registry
# doesn't pull in every model's dependencies.
RATING_PREDICTORS = {
    "GlobalAverage": "mymedialite_tpu.models.baselines:GlobalAverage",
    "UserAverage": "mymedialite_tpu.models.baselines:UserAverage",
    "ItemAverage": "mymedialite_tpu.models.baselines:ItemAverage",
    "Constant": "mymedialite_tpu.models.baselines:Constant",
    "Random": "mymedialite_tpu.models.baselines:RandomRating",
    "UserItemBaseline": "mymedialite_tpu.models.baselines:UserItemBaseline",
    "MatrixFactorization": "mymedialite_tpu.models.mf:MatrixFactorization",
    "BiasedMatrixFactorization":
        "mymedialite_tpu.models.mf:BiasedMatrixFactorization",
    "SocialMF": "mymedialite_tpu.models.social_mf:SocialMF",
    "TimeAwareBaseline": "mymedialite_tpu.models.time_aware:TimeAwareBaseline",
    "TimeAwareBaselineWithFrequencies":
        "mymedialite_tpu.models.time_aware:TimeAwareBaselineWithFrequencies",
    "ExternalRatingPredictor":
        "mymedialite_tpu.models.external:ExternalRatingPredictor",
    "SVDPlusPlus": "mymedialite_tpu.models.svdpp:SVDPlusPlus",
    "GSVDPlusPlus": "mymedialite_tpu.models.svdpp:GSVDPlusPlus",
    "SigmoidSVDPlusPlus": "mymedialite_tpu.models.svdpp:SigmoidSVDPlusPlus",
    "SigmoidItemAsymmetricFactorModel":
        "mymedialite_tpu.models.svdpp:SigmoidItemAsymmetricFactorModel",
    "SigmoidUserAsymmetricFactorModel":
        "mymedialite_tpu.models.svdpp:SigmoidUserAsymmetricFactorModel",
    "SigmoidCombinedAsymmetricFactorModel":
        "mymedialite_tpu.models.svdpp:SigmoidCombinedAsymmetricFactorModel",
    "UserKNN": "mymedialite_tpu.models.knn:UserKNNRating",
    "ItemKNN": "mymedialite_tpu.models.knn:ItemKNNRating",
    "UserAttributeKNN": "mymedialite_tpu.models.knn:UserAttributeKNNRating",
    "ItemAttributeKNN": "mymedialite_tpu.models.knn:ItemAttributeKNNRating",
}

ITEM_RECOMMENDERS = {
    "MostPopular": "mymedialite_tpu.models.item_baselines:MostPopular",
    "Zero": "mymedialite_tpu.models.item_baselines:Zero",
    "Random": "mymedialite_tpu.models.item_baselines:RandomItem",
    "BPRMF": "mymedialite_tpu.models.bpr:BPRMF",
    "MultiCoreBPRMF": "mymedialite_tpu.models.bpr:MultiCoreBPRMF",
    "WeightedBPRMF": "mymedialite_tpu.models.bpr:WeightedBPRMF",
    "SoftMarginRankingMF": "mymedialite_tpu.models.bpr:SoftMarginRankingMF",
    "WRMF": "mymedialite_tpu.models.wrmf:WRMF",
    "LeastSquareSLIM": "mymedialite_tpu.models.slim:LeastSquareSLIM",
    "BPRSLIM": "mymedialite_tpu.models.slim:BPRSLIM",
    "MostPopularByAttributes":
        "mymedialite_tpu.models.item_baselines:MostPopularByAttributes",
    "BigramRules": "mymedialite_tpu.models.item_baselines:BigramRules",
    "ExternalItemRecommender":
        "mymedialite_tpu.models.external:ExternalItemRecommender",
    "UserKNN": "mymedialite_tpu.models.knn:UserKNN",
    "ItemKNN": "mymedialite_tpu.models.knn:ItemKNN",
    "UserAttributeKNN": "mymedialite_tpu.models.knn:UserAttributeKNN",
    "ItemAttributeKNN": "mymedialite_tpu.models.knn:ItemAttributeKNN",
}


def _create(registry, name: str):
    if name not in registry:
        raise KeyError(f"Unknown recommender {name!r}; known: "
                       f"{', '.join(sorted(registry))}")
    module_name, class_name = registry[name].split(":")
    module = importlib.import_module(module_name)
    return getattr(module, class_name)()


def create_rating_predictor(name: str):
    return _create(RATING_PREDICTORS, name)


def create_item_recommender(name: str):
    return _create(ITEM_RECOMMENDERS, name)


def list_rating_predictors():
    return sorted(RATING_PREDICTORS)


def list_item_recommenders():
    return sorted(ITEM_RECOMMENDERS)


def register_rating_predictor(name: str, target: str):
    RATING_PREDICTORS[name] = target


def register_item_recommender(name: str, target: str):
    ITEM_RECOMMENDERS[name] = target
