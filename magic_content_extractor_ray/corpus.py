"""Deterministic synthetic interleaved-document corpus.

Each row of the driver-provided ``documents.parquet`` (doc_id, text, …) is
expanded into one interleaved-span HTML/PDF document. Generation is a pure
function of (doc_id, text): family choice, span counts, media placement and
noise all come from a per-document ``random.Random(doc_id)`` — the same row
always yields the same document at every scale factor, on every worker, so
golden outputs are stable across runs and parallelism levels.

Families exercise every code path of the extract cascade (FIXTURES.md):
article / forum / weixin / pdf plus math, table-code and edge-case variants
folded into the article family. HTML is built from the selector vocabularies
the reference keys on (CONTENT_SELECTORS / NOISE_SELECTORS / WEIXIN /
FORUM selectors, /root/reference/app/types/extractor.ts:44-194).

``attach_spans_batch`` is the Ray-facing entry: a vectorized-enough
``map_batches`` UDF (string assembly per row; no DOM work) that turns a
``documents`` batch into the docs-with-spans table.
"""

from __future__ import annotations

import random

import pyarrow as pa

from .schema import DOCS_SCHEMA

_FAMILY_WHEEL = (
    ["article"] * 35 + ["forum"] * 20 + ["weixin"] * 15 + ["pdf"] * 10
    + ["math"] * 5 + ["tablecode"] * 5 + ["edge"] * 10
)

_STOP_PUNCT = (".", ".", ".", "!", "?")


def _sentences(rng: random.Random, words: list[str], n_sent: int,
               lo: int = 8, hi: int = 18) -> list[str]:
    out = []
    if not words:
        words = ["lorem"]
    for _ in range(n_sent):
        k = rng.randint(lo, hi)
        ws = [words[rng.randrange(len(words))] for _ in range(k)]
        ws[0] = ws[0].capitalize()
        out.append(" ".join(ws) + rng.choice(_STOP_PUNCT))
    return out


def _para(rng, words, n_sent=None) -> str:
    n = n_sent if n_sent is not None else rng.randint(2, 5)
    return " ".join(_sentences(rng, words, n))


def _title_words(rng, words) -> str:
    k = rng.randint(3, 6)
    return " ".join(words[rng.randrange(len(words))] for _ in range(k)).title()


def _noise_header(rng, words) -> str:
    links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(words, min(4, len(words))))
    return (f'<nav class="nav">{links}</nav>'
            f'<div class="header"><span>{words[0]}</span></div>')


def _noise_footer(rng, words) -> str:
    return (f'<div class="sidebar"><div class="widget">{_para(rng, words, 1)}'
            f'</div></div>'
            f'<div class="related"><a href="/r1">{words[0]} more</a></div>'
            f'<div class="footer"><span class="copyright">© {words[-1]}</span></div>')


def _media(rng, doc_id: str, i: int, caption_words) -> dict:
    kind = rng.choice(["image", "image", "image", "video", "iframe"])
    ref = f"https://media.example/{doc_id}/{kind}-{i}.bin"
    cap = " ".join(caption_words[:3]) if rng.random() < 0.7 else ""
    return {"kind": kind, "text": cap, "media_ref": ref}


def _interleave(head: str, body_parts: list, tail: str) -> list[dict]:
    """Build the span list: text fragments between media spans; head/tail
    noise merges into the first/last text span."""
    spans: list[dict] = []
    buf = [head]
    for part in body_parts:
        if isinstance(part, str):
            buf.append(part)
        else:  # media dict
            spans.append({"kind": "text", "text": "".join(buf), "media_ref": ""})
            spans.append(dict(part))
            buf = []
    buf.append(tail)
    spans.append({"kind": "text", "text": "".join(buf), "media_ref": ""})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------

def _gen_article(rng, doc_id, words, variant="plain"):
    title = _title_words(rng, words)
    site = words[rng.randrange(len(words))].title()
    n_paras = max(2, int(rng.lognormvariate(1.4, 0.7)))
    author = words[rng.randrange(len(words))].title()
    date = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"

    body: list = [f"<h1>{title}</h1>"]
    body.append(f'<p class="byline-x">Posted by <span class="author">{author}</span>'
                f' <time datetime="{date}">{date}</time></p>')
    n_media = rng.randint(0, max(1, n_paras // 3))
    media_at = set(rng.sample(range(n_paras), n_media)) if n_media else set()
    mi = 0
    heading_level = 2
    for i in range(n_paras):
        if i > 0 and rng.random() < 0.3:
            # heading hierarchy with occasional gaps (exercises flattening)
            heading_level = rng.choice([2, 3, 4, 5])
            body.append(f"<h{heading_level}>{_title_words(rng, words)}</h{heading_level}>")
        if variant == "math" and rng.random() < 0.5:
            roll = rng.random()
            if roll < 0.25:
                body.append(f"<p>{_para(rng, words, 1)} "
                            f"\\begin{{equation}}{words[0]} = {words[1]}^2"
                            f"\\end{{equation}} {_para(rng, words, 1)}</p>")
            elif roll < 0.4:
                body.append(f"<p>{_para(rng, words, 1)} "
                            f"\\begin{{align}}{words[0]} &= {words[1]}"
                            f"\\end{{align}}</p>")
            else:
                body.append(f"<p>{_para(rng, words, 1)} $${words[0]}^2 + {words[1]}$$ "
                            f"{_para(rng, words, 1)} ${words[2]}_i$ tail.</p>")
        elif variant == "tablecode" and i == 1:
            rows = "".join(
                f"<tr><td>{words[j % len(words)]}</td><td>{j}</td></tr>"
                for j in range(3))
            body.append(f"<table>{rows}</table>")
            body.append(f'<pre class="language-python">def f_{i}(x):'
                        f"  return x</pre>")
        else:
            body.append(f"<p>{_para(rng, words)}</p>")
        if rng.random() < 0.2:
            body.append(f"<blockquote>{_para(rng, words, 1)}"
                        f"<cite>{author}</cite></blockquote>")
        if rng.random() < 0.1:
            # footnote / sidenote classes (BaseExtractor.ts:506-542)
            body.append(f'<div class="footnote"><a href="#fn{i}">[{i}]</a> '
                        f"{_para(rng, words, 1)}</div>")
        if rng.random() < 0.06:
            body.append(f'<span class="sidenote">{_para(rng, words, 1)}</span>')
        if rng.random() < 0.12:
            # lazy-load image as raw HTML inside a text span (data-src /
            # data-original promotion path, BaseExtractor.ts:584-590)
            lazy_attr = rng.choice(["data-src", "data-original"])
            body.append(f'<img {lazy_attr}='
                        f'"https://media.example/{doc_id}/lazy-{i}.jpg" '
                        f'alt="{words[i % len(words)]}">')
        if i in media_at:
            body.append(_media(rng, doc_id, mi, words))
            mi += 1

    # occasional special-site documents (handleSpecialSites,
    # ArticleExtractor.ts:191-217) and base-href resolution (:167-169)
    site_roll = rng.random()
    extra_head = ""
    strip_block = ""
    if site_roll < 0.08:
        url = f"https://blog.csdn.net/{doc_id}"
        strip_block = '<div class="article-copyright">CSDN copyright</div>'
    elif site_roll < 0.14:
        url = f"https://www.jianshu.com/p/{doc_id}"
        strip_block = '<div class="support-author">赞赏支持</div>'
    elif site_roll < 0.20:
        url = f"https://zhuanlan.zhihu.com/p/{doc_id}"
        strip_block = '<div class="ContentItem-actions">actions</div>'
    else:
        url = f"https://blog.example/{doc_id}"
    if rng.random() < 0.1:
        extra_head = f'<base href="https://cdn.example/{doc_id}/">'

    # ~12% of articles use a bare <main> container with a neutral class:
    # no xpath-intent or custom selector matches, so the cascade reaches
    # stage 3 (CONTENT_SELECTORS 'main', BaseExtractor.ts:227-232)
    if rng.random() < 0.12:
        open_tag, close_tag = '<main class="page-zone">', "</main>"
    else:
        open_tag, close_tag = '<article class="post-content">', "</article>"
    head = (f"<html><head><title>{title} | {site}</title>{extra_head}"
            f'<meta property="og:title" content="{title}">'
            f'<meta name="author" content="{author}">'
            f'<meta property="article:published_time" content="{date}T08:00:00Z">'
            f"</head><body>{_noise_header(rng, words)}"
            f"{open_tag}{strip_block}")
    tail = f"{close_tag}{_noise_footer(rng, words)}</body></html>"
    return url, _interleave(head, body, tail)


def _gen_edge(rng, doc_id, words):
    """Edge cases: link farm, near-empty, heuristic path, body fallback,
    hidden content, media-only, giant doc (skew)."""
    case = rng.choice(["linkfarm", "tiny", "heuristic", "bodyfall",
                       "hidden", "mediaonly", "giant"])
    url = f"https://www.example/{case}/{doc_id}"
    if case == "linkfarm":
        links = "".join(f'<a href="/l{i}">{_title_words(rng, words)}</a> '
                        for i in range(30))
        html = (f"<html><head><title>Links</title></head><body>"
                f'<div class="content-body">{links}</div></body></html>')
        return url, [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    if case == "tiny":
        html = (f"<html><head><title>t</title></head><body><p>{words[0]}</p>"
                f"</body></html>")
        return url, [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    if case == "heuristic":
        # no CONTENT_SELECTORS match: neutral class names → findBestNode path
        paras = "".join(f"<p>{_para(rng, words)}</p>" for _ in range(5))
        html = (f"<html><head><title>{_title_words(rng, words)}</title></head>"
                f'<body>{_noise_header(rng, words)}'
                f'<div class="story-wrap"><div class="story-inner">{paras}</div></div>'
                f"{_noise_footer(rng, words)}</body></html>")
        return url, [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    if case == "bodyfall":
        html = (f"<html><head><title>bare</title></head><body>"
                f"{_para(rng, words, 2)}</body></html>")
        return url, [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    if case == "hidden":
        html = (f"<html><head><title>{_title_words(rng, words)}</title></head>"
                f"<body><div style=\"display: none\">secret {words[0]}</div>"
                f'<div class="entry-content"><p>{_para(rng, words, 4)}</p>'
                f"<p>{_para(rng, words, 4)}</p></div></body></html>")
        return url, [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    if case == "mediaonly":
        head = (f"<html><head><title>gallery</title></head><body>"
                f'<div class="main-content">')
        body = [_media(rng, doc_id, i, words) for i in range(rng.randint(2, 5))]
        tail = "</div></body></html>"
        return url, _interleave(head, body, tail)
    # giant: 60-200 paragraphs (straggler / skew bucket)
    n = rng.randint(60, 200)
    body = [f"<h1>{_title_words(rng, words)}</h1>"]
    for i in range(n):
        body.append(f"<p>{_para(rng, words)}</p>")
        if i % 17 == 0:
            body.append(_media(rng, doc_id, i, words))
    head = (f"<html><head><title>{_title_words(rng, words)}</title></head>"
            f'<body><article class="article-content">')
    return url, _interleave(head, body, "</article></body></html>")


def _gen_forum(rng, doc_id, words):
    title = _title_words(rng, words)
    n_replies = max(1, int(rng.lognormvariate(1.2, 0.8)))
    views = rng.randint(100, 99999)
    date = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"

    def post(cls, pid, n_sent):
        sig = ('<div class="user-signature">sig text here</div>'
               if rng.random() < 0.4 else "")
        quote = (f'<div class="quote">{_para(rng, words, 1)}</div>'
                 if rng.random() < 0.3 else "")
        return (f'<div class="{cls}" id="{pid}">{quote}'
                f"<p>{_para(rng, words, n_sent)}</p>{sig}</div>")

    # ~25% of threads have no .first-post class: the main post is found via
    # the [id*="post-1"]/[id*="post_1"] fallback (ForumExtractor.ts:231-234)
    if rng.random() < 0.25:
        main_post = post("post", "post_1", rng.randint(3, 6))
    else:
        main_post = post("post first-post", "post-1", rng.randint(3, 6))
    replies = [post("reply post", f"post-{i + 2}", rng.randint(1, 4))
               for i in range(n_replies)]
    # main post NOT first (exercises the reorder) for most docs
    if rng.random() < 0.7 and replies:
        k = rng.randrange(1, len(replies) + 1)
        parts = replies[:k] + [main_post] + replies[k:]
    else:
        parts = [main_post] + replies

    emoji = ('<img class="emoji" src="https://forum.example/emoji/smile.png">'
             if rng.random() < 0.5 else "")
    body: list = [emoji]
    n_media = rng.randint(0, 2)
    for i, p in enumerate(parts):
        body.append(p)
        if i < n_media:
            body.append(_media(rng, doc_id, i, words))
    body.append(f'<span class="reply-count">{n_replies} replies</span>'
                f'<span class="view-count">{views} views</span>'
                f'<span class="post-time">{date}</span>')

    head = (f"<html><head><title>{title} - Forum</title></head><body>"
            f"{_noise_header(rng, words)}"
            f'<div class="thread-content">')
    tail = f"</div>{_noise_footer(rng, words)}</body></html>"
    url = f"https://bbs.example/thread/{doc_id}"
    return url, _interleave(head, body, tail)


def _gen_weixin(rng, doc_id, words):
    title = _title_words(rng, words)
    author = words[rng.randrange(len(words))].title()
    date = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    n_paras = max(2, int(rng.lognormvariate(1.3, 0.6)))

    body: list = []
    n_media = rng.randint(0, max(1, n_paras // 2))
    mi = 0
    for i in range(n_paras):
        body.append(f"<p>{_para(rng, words)}</p>")
        if mi < n_media and rng.random() < 0.5:
            m = _media(rng, doc_id, mi, words)
            if m["kind"] == "image":
                # weixin lazy-load form: the generator emits the media span;
                # reassembly renders <img src=...>; the data-src path is
                # exercised via the raw-HTML variant below
                pass
            body.append(m)
            mi += 1
    if rng.random() < 0.5:
        body.append('<span class="video_iframe" data-vidtype="'
                    f'v{rng.randint(1000, 9999)}"></span>')

    head = (f"<html><head><title>{title}</title></head><body>"
            f'<div class="rich_media_area_primary">'
            f'<h2 id="activity-name">{title}</h2>'
            f'<div id="meta_content"><span class="rich_media_meta_nickname">'
            f"{author}</span></div>"
            f'<div id="js_name">{author}</div>'
            f'<em id="publish_time">{date}</em>'
            f'<span id="js_read_count">{rng.randint(1000, 100000)} 阅读</span>'
            f'<div id="js_content">')
    tail = (f"</div>"
            f'<div class="reward_area">赞赏</div>'
            f'<div class="qr_code_pc_outer">QR</div>'
            f"</div></body></html>")
    url = f"https://mp.weixin.qq.com/s/{doc_id}"
    return url, _interleave(head, body, tail)


def _gen_pdf(rng, doc_id, words):
    """Layout-marked blocks in deliberately shuffled stream order."""
    n_pages = rng.randint(1, 4)
    two_col = rng.random() < 0.4
    header = f"{_title_words(rng, words)} preprint"
    title = _title_words(rng, words)
    blocks = []  # (page, y, x, col, kind, text, ref)
    for pg in range(1, n_pages + 1):
        blocks.append((pg, 30, 40, 0, "text", header, ""))
        blocks.append((pg, 760, 40, 0, "text", f"Page {pg}", ""))
        y = 100
        if pg == 1:
            blocks.append((1, 100, 40, 0, "text", title, ""))
            y = 160
        n_blocks = rng.randint(3, 8)
        for i in range(n_blocks):
            col = rng.randint(0, 1) if two_col else 0
            x = 320 if col else 40
            if rng.random() < 0.15:
                blocks.append((pg, y, x, col, "image", f"figure {pg}.{i}",
                               f"pdf://{doc_id}/p{pg}/fig{i}"))
            else:
                blocks.append((pg, y, x, col, "text", _para(rng, words, 2), ""))
            y += rng.randint(40, 90)
    rng.shuffle(blocks)  # raw stream order ≠ reading order
    spans = []
    for i, (pg, y, x, col, kind, text, ref) in enumerate(blocks):
        marker = f"⟦p={pg};y={y};x={x};c={col}⟧"
        spans.append({"kind": kind, "text": marker + text,
                      "media_ref": ref, "offset": i})
    url = f"https://papers.example/{doc_id}.pdf"
    return url, spans


def generate_doc(doc_id_int: int, text: str) -> dict:
    """Pure deterministic generator: documents.parquet row → spans doc."""
    rng = random.Random(doc_id_int * 2654435761 % (2 ** 31))
    words = [w for w in (text or "").split() if w][:64] or ["data", "ray"]
    family = _FAMILY_WHEEL[rng.randrange(len(_FAMILY_WHEEL))]
    doc_id = f"doc-{doc_id_int:08d}"
    if family == "forum":
        url, spans = _gen_forum(rng, doc_id, words)
    elif family == "weixin":
        url, spans = _gen_weixin(rng, doc_id, words)
    elif family == "pdf":
        url, spans = _gen_pdf(rng, doc_id, words)
    elif family == "math":
        url, spans = _gen_article(rng, doc_id, words, variant="math")
    elif family == "tablecode":
        url, spans = _gen_article(rng, doc_id, words, variant="tablecode")
    elif family == "edge":
        url, spans = _gen_edge(rng, doc_id, words)
    else:
        url, spans = _gen_article(rng, doc_id, words)
    return {"doc_id": doc_id, "spans": spans, "url": url, "family": family}


def attach_spans_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: documents batch (doc_id, text) → docs-with-spans
    batch. String assembly only; cost is linear in output size."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = [generate_doc(d, t) for d, t in zip(doc_ids, texts)]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def docs_dataset(sf_dir: str, *, num_blocks: int | None = None):
    """Ray Dataset of interleaved-span docs derived from ``documents.parquet``
    (columns pruned at the read; generation streams per batch).

    A single parquet file reads as ONE block, which would serialize the
    generate stage — split to ~4 blocks per core by default.
    """
    import ray

    from .sources.io import read_parquet_clean

    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if \
            ray.is_initialized() else 8
        num_blocks = cpus * 4
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    ).map_batches(attach_spans_batch, batch_format="pyarrow", batch_size=64)
