"""Hand-written realistic page layouts (news site, docs page, blog with
comment section) — qualitative checks that the cascade picks the right
container and strips the right chrome, beyond the synthetic corpus's
vocabulary."""

from magic_content_extractor_ray.api import extract_html

NEWS = '''
<html><head>
<title>Markets rally as rates hold steady | The Daily Ledger</title>
<meta property="og:title" content="Markets rally as rates hold steady">
<meta name="author" content="Dana Reyes">
<meta property="article:published_time" content="2024-06-03T09:30:00Z">
</head><body>
<div class="header"><a href="/">The Daily Ledger</a>
  <div class="nav"><a href="/world">World</a><a href="/biz">Business</a>
  <a href="/tech">Tech</a><a href="/sport">Sport</a></div></div>
<div class="breadcrumb"><a href="/">Home</a> &gt; <a href="/biz">Business</a></div>
<article class="article-body">
  <h1>Markets rally as rates hold steady</h1>
  <p>Equity markets climbed on Tuesday after the central bank held its key
  interest rate unchanged, a move investors read as a sign that the long
  tightening cycle has reached its plateau at last.</p>
  <img src="https://cdn.ledger.example/img/trading-floor.jpg"
       alt="Traders on the exchange floor">
  <p>Analysts said the decision, while widely expected, removes a layer of
  uncertainty that had weighed on risk assets since the spring. Bond yields
  eased and the dollar slipped against major currencies.</p>
  <blockquote>"The path from here is data-dependent, but the worst of the
  volatility is probably behind us," said one strategist.<cite>Dana
  Reyes</cite></blockquote>
  <p>Attention now turns to Friday's employment report, which could still
  complicate the picture if wage growth re-accelerates beyond forecasts.</p>
</article>
<div class="sidebar"><div class="widget">Newsletter signup</div>
  <div class="related"><a href="/a1">Related: Bank profits surge</a>
  <a href="/a2">Related: Housing cools</a></div></div>
<div class="footer"><span class="copyright">© 2024 The Daily Ledger</span></div>
</body></html>
'''

BLOG_WITH_COMMENTS = '''
<html><head><title>Why our build got 10x faster — devlog</title></head><body>
<header><nav class="navbar"><a href="/">devlog</a><a href="/about">about</a></nav></header>
<main>
<div class="entry-content">
  <h1>Why our build got 10x faster</h1>
  <p class="byline-q">Posted by <span class="author">sam</span>
     <time datetime="2024-02-11">Feb 11, 2024</time></p>
  <p>We spent a quarter chasing a slow CI pipeline before discovering that
  the vast majority of wall time went to re-downloading dependencies that
  never changed between runs, a problem with a boring, well-known fix.</p>
  <pre class="language-bash">cache:
  key: deps-v2
  paths: [node_modules]</pre>
  <p>After caching, median build time dropped from forty minutes to four.
  The remaining wins came from splitting the test suite across workers and
  deleting a retry loop that masked a flaky integration test for years.</p>
</div>
<div class="comments" id="comments">
  <div class="comment"><b>alex</b>: Great writeup, we hit the same thing.</div>
  <div class="comment"><b>kim</b>: What about docker layer caching?</div>
</div>
</main>
<footer class="footer">rss · mastodon</footer>
</body></html>
'''

DOCS_PAGE = '''
<html><head><title>quickstart - framework docs</title></head><body>
<div class="sidebar"><a href="/install">install</a><a href="/api">api</a>
<a href="/faq">faq</a><a href="/guide">guide</a><a href="/cli">cli</a></div>
<main class="page-main">
  <h1>Quickstart</h1>
  <p>Install the package, create a configuration file, and run the
  development server to see the starter application in your browser within
  a couple of minutes of setup work at most.</p>
  <pre class="language-python">import framework
app = framework.App()
app.run()</pre>
  <p>The server watches your sources and reloads automatically whenever a
  file changes, so the edit-refresh loop stays fast during development.</p>
  <table><tr><td>flag</td><td>meaning</td></tr>
  <tr><td>--port</td><td>listen port</td></tr></table>
</main>
</body></html>
'''


def test_news_article():
    out = extract_html(NEWS, url="https://ledger.example/biz/rates")
    assert out["title"] == "Markets rally as rates hold steady"
    assert out["metadata"]["author"] == "Dana Reyes"
    assert out["metadata"]["platform"] == "article"
    c = out["content"]
    assert "Equity markets climbed" in c
    assert "![Traders on the exchange floor]" in c
    assert "data-dependent" in c
    # chrome stripped
    assert "Newsletter signup" not in c
    assert "World" not in c and "Sport" not in c  # nav gone
    assert "Related:" not in c


def test_blog_comments_stripped_for_article():
    out = extract_html(BLOG_WITH_COMMENTS, url="https://devlog.example/fast")
    c = out["content"]
    assert "re-downloading dependencies" in c
    assert "```bash" in c  # fenced code with language
    # article strategy strips the comment section
    assert "Great writeup" not in c
    assert "docker layer caching" not in c
    assert "rss" not in c


def test_docs_page_main_selected():
    out = extract_html(DOCS_PAGE, url="https://docs.example/quickstart")
    c = out["content"]
    assert "# Quickstart" in c
    assert "framework.App()" in c
    assert "--port" in c            # table kept
    assert "faq" not in c           # sidebar stripped


FORUM_THREAD = '''
<html><head><title>Weird memory growth in long-running worker - DevTalk Forum</title></head>
<body>
<div class="header"><a href="/">DevTalk</a><div class="nav">
<a href="/new">new</a><a href="/top">top</a></div></div>
<div class="thread-content">
  <div class="reply post" id="post-2">
    <div class="user-info">moderator · 12k posts</div>
    <p>Check whether you are holding references in a module-level cache;
    that is the usual culprit for unbounded growth in worker processes that
    recycle jobs without restarting the interpreter between tasks. Caches
    keyed by request payload are especially sneaky because every distinct
    payload adds an entry that nothing ever evicts, and the growth rate then
    tracks traffic diversity rather than volume, which is why it looks
    random when you plot it against requests per second.</p>
  </div>
  <div class="post first-post" id="post-1">
    <p>Our background worker grows by about thirty megabytes an hour until
    the container is killed. Heap profiling shows mostly small dictionaries
    and we cannot figure out who owns them. The workload itself is a simple
    queue consumer that processes a few hundred jobs a minute. We have
    ruled out the obvious suspects: connections are pooled, responses are
    streamed, and the job objects themselves are small. Restarting the
    process clears it, so it is definitely state accumulating inside the
    interpreter rather than kernel-side memory.</p>
  </div>
  <div class="reply post" id="post-3">
    <div class="quote">Check whether you are holding references…</div>
    <p>Adding to this: enable tracemalloc snapshots every few minutes and
    diff them; the owning frame usually shows up within an hour of runtime
    and makes the leak obvious in a way sampling profilers do not. In our
    case the diff pointed straight at a memoization decorator someone added
    to a hot serialization helper two years ago, invisible in code review
    because the decorator lived in a shared utility module.</p>
  </div>
  <span class="reply-count">2 replies</span>
  <span class="view-count">5,812 views</span>
</div>
<div class="footer">© DevTalk</div>
</body></html>
'''


def test_forum_thread_reordered():
    out = extract_html(FORUM_THREAD, url="https://devtalk.example/thread/88")
    assert out["metadata"]["platform"] == "forum"
    assert out["metadata"]["replyCount"] == 2
    assert out["metadata"]["viewCount"] == 5812
    c = out["content"]
    # main post first despite appearing second in the source
    assert c.index("background worker grows") < c.index("module-level cache")
    assert "tracemalloc" in c
    # user chrome stripped
    assert "12k posts" not in c


WEIXIN_ARTICLE = '''
<html><head><title>一文读懂分布式数据处理</title></head><body>
<div class="rich_media_area_primary">
  <h2 id="activity-name">一文读懂分布式数据处理</h2>
  <div id="js_name">技术小灶</div>
  <em id="publish_time">2024-05-20</em>
  <div id="js_content">
    <p>当数据量超过单机内存时，真正重要的不是框架的名字，而是数据如何被切分、
    混洗与重组。理解这三个动作，就理解了分布式计算的大半。本文用最朴素的语言
    把这三件事讲清楚，并给出常见的性能陷阱清单。</p>
    <img data-src="https://mmbiz.example/pipeline-diagram" alt="流水线示意图">
    <p>切分决定并行度，混洗决定网络开销，重组决定内存峰值。三者中混洗最贵，
    因为它要求所有节点两两交换数据；能用广播或预聚合避免的混洗都应该避免。</p>
  </div>
  <div class="reward_area">喜欢作者</div>
  <div class="qr_code_pc_outer">扫码关注</div>
</div>
</body></html>
'''


def test_weixin_article():
    out = extract_html(WEIXIN_ARTICLE, url="https://mp.weixin.qq.com/s/abc123")
    assert out["metadata"]["platform"] == "weixin"
    assert out["metadata"]["author"] == "技术小灶"
    assert out["metadata"]["publishTime"] == "2024-05-20"
    c = out["content"]
    assert "分布式计算" in c
    assert "![流水线示意图](https://mmbiz.example/pipeline-diagram)" in c
    assert "喜欢作者" not in c
    assert "扫码关注" not in c


def test_base_href_resolution():
    """A <base href> overrides the request URL in the result (the
    reference's ArticleExtractor base-resolution path)."""
    from magic_content_extractor_ray.extractors.registry import (
        build_strategies)

    html = ("<html><head><base href='https://cdn.example.org/articles/'>"
            "<title>Based</title></head><body><article><p>"
            + "Plenty of real article content here to pass thresholds. " * 8
            + "</p></article></body></html>")
    res = build_strategies()["article"].extract(html, "https://short.ly/x")
    assert res.url == "https://cdn.example.org/articles/"
    # non-http base is ignored → request URL stays effective
    html2 = html.replace("https://cdn.example.org/articles/", "/relative/")
    res2 = build_strategies()["article"].extract(html2, "https://short.ly/x")
    assert res2.url == "https://short.ly/x"


def test_forum_count_parsing_with_separators():
    """Reply/view counts parse through thousand separators and CJK labels
    (parseInt(text.replace(/[^0-9]/g,'')) semantics)."""
    from magic_content_extractor_ray.extractors.registry import (
        build_strategies)

    posts = "".join(
        f"<div class='post'><div class='post-content'><p>"
        f"Forum reply number {i} with a good amount of distinct text "
        f"so the thread clears the forum thresholds easily.</p></div></div>"
        for i in range(4))
    html = (
        "<html><head><title>T</title></head><body><div class='forum'>"
        "<span class='reply-count'>回复 1,234</span>"
        "<span class='view-count'>浏览 56,789 次</span>"
        f"{posts}</div></body></html>")
    res = build_strategies()["forum"].extract(
        html, "https://bbs.example.com/thread/9")
    assert res.reply_count == 1234
    assert res.view_count == 56789


def test_math_mixed_markdown_output():
    """Inline and display math lifted from text nodes survive into the
    markdown output via data-tex passthrough."""
    from magic_content_extractor_ray.extractors.registry import (
        build_strategies, extract_document)

    body = ("<article><p>Consider the identity $e^{i\\pi}+1=0$ inside a "
            "paragraph with plenty of additional words to clear every "
            "threshold of the extractor cascade and then some.</p>"
            "<p>$$\\int_0^1 x^2 dx = 1/3$$</p>"
            "<p>More trailing prose so scoring favors this article body "
            "over any other candidate in the document tree.</p></article>")
    html = f"<html><head><title>M</title></head><body>{body}</body></html>"
    spans = [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
    row = extract_document("m1", spans, "https://e.com/math",
                           build_strategies(), None, ("markdown",))
    assert row["error"] == ""
    joined = " ".join(s["text"] for s in row["spans"])
    assert "math-inline" in joined and "math-display" in joined
    assert "e^{i\\pi}+1=0" in row["markdown"]
    assert "\\int_0^1 x^2 dx" in row["markdown"]
