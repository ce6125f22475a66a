"""User-extension surface: custom strategies and score-weight overrides."""

from magic_content_extractor_ray.extractors.base import (
    BaseStrategy, ExtractorOptions)
from magic_content_extractor_ray.extractors.registry import (
    register_strategy, build_strategies, _STRATEGIES)
from magic_content_extractor_ray.functions.heuristics import ScoreWeights
from magic_content_extractor_ray.htmlib import parse, find_first


def test_register_custom_strategy():
    class MyStrategy(BaseStrategy):
        platform = "custom"

    register_strategy("custom", MyStrategy)
    try:
        strategies = build_strategies()
        assert "custom" in strategies
        assert isinstance(strategies["custom"], MyStrategy)
    finally:
        _STRATEGIES.pop("custom", None)


def test_weight_override_changes_score():
    html = '<div class="content"><p>' + "x" * 250 + "</p></div>"
    node = find_first(parse(html), "div")

    default = BaseStrategy()
    boosted = BaseStrategy(ExtractorOptions(weights=ScoreWeights(
        positive_classes={"content": 50})))
    assert boosted.node_score(node) > default.node_score(node)
