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


def test_driver_contract_key_parity():
    """Every queries() entry has an oracle_sql() entry and vice versa —
    the driver records a weaker rows-only check for any query missing
    an oracle, so a key drift here silently downgrades the gate."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q, o = set(m.queries()), set(m.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
