"""Scoring heuristics and helper predicates for main-content extraction.

Pure functions over the mini-DOM; formulas replicate the reference exactly,
including integer floor/min clamps and divide guards:

- tag / class weight tables: /root/reference/app/lib/BaseExtractor.ts:8-40
- calculate_node_score:      BaseExtractor.ts:251-297
- calculate_content_score:   BaseExtractor.ts:669-726
- score_element (alt scorer): app/utils/extractor.ts:72-111
- dice similarity:           app/utils/similarity.ts:4-20
- link/text density + predicates: app/utils/extractor.ts:38-70,
  BaseExtractor.ts:146-164
"""

from __future__ import annotations

import math
import re

from ..htmlib.dom import Node

TAG_WEIGHTS = {
    "article": 10, "main": 8, "section": 6, "div": 4, "p": 3, "pre": 3,
    "code": 3, "blockquote": 2, "figure": 2, "table": 2,
}

POSITIVE_CLASS_WEIGHTS = {
    "article": 8, "content": 8, "post": 6, "entry": 6, "text": 4, "body": 4,
}

NEGATIVE_CLASS_WEIGHTS = {
    "sidebar": -8, "comment": -6, "advertisement": -8, "ad": -8, "nav": -6,
    "footer": -6, "header": -4,
}

KEEP_ATTRIBUTES = frozenset(
    {"src", "href", "title", "alt", "class", "id", "name", "content",
     "data-src", "data-original",
     # deviation from BaseExtractor.ts:43-54: the forum main-post reorder
     # (ForumExtractor.ts:245-273) needs the per-doc unique id to survive
     # attribute cleaning; in the reference it is stripped, which dead-ends
     # the reorder. We keep it (goldens pin the corrected semantics) and drop
     # it from the final serialized spans.
     "data-unique-id",
     # math lifting tags formulas with data-tex (BaseExtractor.ts:423,434)
     "data-tex", "data-language"}
)

_PUNCT_RE = re.compile(r"[.。!！?？]")
_WS_RE = re.compile(r"\s+")


from dataclasses import dataclass, field


@dataclass(frozen=True)
class ScoreWeights:
    """User-override surface for the scoring tables (the reference's
    ``ExtractorConfig.weights`` shape, app/types/extractor.ts:236-260)."""
    tags: dict = field(default_factory=lambda: dict(TAG_WEIGHTS))
    positive_classes: dict = field(
        default_factory=lambda: dict(POSITIVE_CLASS_WEIGHTS))
    negative_classes: dict = field(
        default_factory=lambda: dict(NEGATIVE_CLASS_WEIGHTS))


def dice_similarity(a: str, b: str) -> float:
    """Dice coefficient over lowercase whitespace tokens
    (app/utils/similarity.ts:4-20; duplicates in ``a`` count, as in the
    reference's ``filter``/``includes`` pairing)."""
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    w1 = a.lower().split()
    w2 = b.lower().split()
    s2 = set(w2)
    common = sum(1 for w in w1 if w in s2)
    return (2.0 * common) / (len(w1) + len(w2))


def text_length(node: Node) -> int:
    return node.text_len()


def first_link_text_len(node: Node) -> int:
    """Length of the FIRST <a> descendant's trimmed text — the reference
    scores only ``$node.find('a').get(0)`` (BaseExtractor.ts:272-273)."""
    a = node.find_first("a")
    return a.text_len() if a is not None else 0


def all_links_text_len(node: Node) -> int:
    """Concatenated trimmed text of all links (BaseExtractor.ts:710-712)."""
    return len("".join(a.text() for a in node.find("a")).strip())


def node_stats(node: Node) -> dict:
    """One-walk stats for the scorers (htmlib.multimatch.subtree_stats)."""
    from ..htmlib.multimatch import subtree_stats

    return subtree_stats(node)


def calculate_node_score(node: Node, stats: dict | None = None,
                         weights: "ScoreWeights | None" = None) -> float:
    """Readability-style base score (BaseExtractor.ts:251-297).

    ``weights`` is the user-override surface (the reference declares
    ``ExtractorConfig.weights``, app/types/extractor.ts:236-260, but its live
    code path uses the hard-coded ``BaseExtractor`` tables — we use those
    same executed-path defaults and make the override real)."""
    if node.type != "tag" or not node.tag:
        return 0.0
    if stats is None:
        stats = node_stats(node)
    tag_w = weights.tags if weights else TAG_WEIGHTS
    pos_w = weights.positive_classes if weights else POSITIVE_CLASS_WEIGHTS
    neg_w = weights.negative_classes if weights else NEGATIVE_CLASS_WEIGHTS
    score = 0.0
    score += tag_w.get(node.tag, 0)

    for cls in node.classes():
        lc = cls.lower()
        score += pos_w.get(lc, 0)
        score += neg_w.get(lc, 0)

    tlen = len(stats["text"].strip())
    link_len = len(stats["first_link_text"].strip())
    link_density = link_len / (tlen or 1)

    score += min(tlen // 100, 10)
    if link_density > 0.5:
        score -= math.floor(link_density * 10)

    score += min(stats["n_img"] * 2, 8)
    score += min(stats["n_p"], 5)
    score += min(stats["n_heading"] * 2, 6)
    return score


def calculate_content_score(node: Node, base_score: float | None = None,
                            stats: dict | None = None) -> float:
    """Extended scorer used by the heuristic best-node search
    (BaseExtractor.ts:669-726)."""
    if stats is None:
        stats = node_stats(node)
    score = base_score if base_score is not None else \
        calculate_node_score(node, stats)

    tlen = len(stats["text"].strip())
    inner = node.inner_html()
    score += (tlen / (len(inner) or 1)) * 10.0

    para_score = 0
    for p in node.find("p"):
        pt = p.text().strip()
        if len(pt) > 50:
            para_score += 2
        if _PUNCT_RE.search(pt):
            para_score += 1
    score += min(para_score, 30)

    score += (5 if stats["n_img"] else 0)
    score += (5 if stats["n_table"] else 0)
    score += (3 if stats["n_list"] else 0)
    score += (3 if stats["n_code"] else 0)

    score -= node.depth()

    link_density = len(stats["links_text"].strip()) / (tlen or 1)
    score -= link_density * 20.0

    lower = inner.lower()
    for kw in ("article", "content", "post", "entry", "main", "text"):
        if kw in lower:
            score += 2
    return max(0.0, score)


_ALT_TAG_SCORES = {"article": 30, "main": 25, "section": 20, "div": 5}
_ALT_PATTERNS = (
    re.compile(r"article|post|content|text", re.I),
    re.compile(r"main|body", re.I),
    re.compile(r"entry|blog", re.I),
)


def score_element(node: Node) -> int:
    """Alternate scorer used by the ReadabilityPlus strategy
    (app/utils/extractor.ts:72-111)."""
    score = _ALT_TAG_SCORES.get(node.tag or "", 0)
    class_and_id = (node.get("class") or "") + " " + (node.get("id") or "")
    for pat in _ALT_PATTERNS:
        if pat.search(class_and_id):
            score += 25
    tlen = node.text_len()
    score += min(tlen // 100, 50)
    score += len(node.find("p")) * 5
    score += len(node.find("img")) * 5
    return score


def has_visible_content(node: Node) -> bool:
    """app/utils/extractor.ts:47-52"""
    if node.text().strip():
        return True
    return node.find_first("img, video, iframe, embed") is not None


def has_valid_links(node: Node) -> bool:
    """app/utils/extractor.ts:54-70"""
    for a in node.find("a"):
        href = a.get("href")
        if (href and a.text().strip() and not href.startswith("#")
                and not href.startswith("javascript:")):
            return True
    return False


def longest_common_subsequence(a: str, b: str) -> str:
    """LCS via DP (app/utils/similarity.ts:25-57). Dead code in the
    reference — defined but never called (SURVEY.md M12); provided for API
    parity and capped for safety."""
    m, n = len(a), len(b)
    if m * n > 1_000_000:
        raise ValueError("inputs too long for O(mn) LCS")
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        ai = a[i - 1]
        row, prev = dp[i], dp[i - 1]
        for j in range(1, n + 1):
            row[j] = prev[j - 1] + 1 if ai == b[j - 1] else \
                max(prev[j], row[j - 1])
    out = []
    i, j = m, n
    while i > 0 and j > 0:
        if a[i - 1] == b[j - 1]:
            out.append(a[i - 1])
            i -= 1
            j -= 1
        elif dp[i - 1][j] > dp[i][j - 1]:
            i -= 1
        else:
            j -= 1
    return "".join(reversed(out))


def edit_distance(a: str, b: str) -> int:
    """Levenshtein DP (app/utils/similarity.ts:62-87; reference dead code,
    SURVEY.md M12)."""
    m, n = len(a), len(b)
    if m * n > 1_000_000:
        raise ValueError("inputs too long for O(mn) edit distance")
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        ai = a[i - 1]
        for j in range(1, n + 1):
            cur[j] = prev[j - 1] if ai == b[j - 1] else \
                1 + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[n]


def parse_count(text: str) -> int | None:
    """``parseInt(text.replace(/[^0-9]/g,''))`` (ForumExtractor.ts:143)."""
    digits = re.sub(r"[^0-9]", "", text)
    return int(digits) if digits else None


def collapse_ws(s: str) -> str:
    return _WS_RE.sub(" ", s)


def normalize_entities(html: str) -> str:
    """Shared pre-normalize (ArticleExtractor.ts:161-164 et al.):
    ``&nbsp;``/``&#160;`` → space, collapse all whitespace runs."""
    html = html.replace("&nbsp;", " ").replace("&#160;", " ")
    return _WS_RE.sub(" ", html)
