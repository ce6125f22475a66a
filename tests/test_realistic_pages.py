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
