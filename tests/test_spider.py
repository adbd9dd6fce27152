"""Acquisition-tooling tests (ttts_tpu/data/spider.py vs reference
ttts/spider/): crawler extraction/pagination logic on fixture HTML with an
injected fetcher — no selenium, no network."""

import numpy as np

from ttts_tpu.data.spider import (
    crawl_playerfm,
    crawl_xmly,
    extract_playerfm_audio_urls,
    parse_xmly_album_links,
    parse_xmly_next_page,
    total_duration,
)

PLAYERFM_HTML = """
<html><body>
  <a class="ep" href="https://cdn.player.fm/ep1.m4a">ep 1</a>
  <a class="dup" href="https://cdn.player.fm/ep1.m4a">ep 1 again</a>
  <a href="/series/other">not audio</a>
  <a class="ep" href="https://cdn.player.fm/ep2.m4a">ep 2</a>
  <a class="dup" href="https://cdn.player.fm/ep2.m4a">ep 2 again</a>
  <a class="ep" href="https://cdn.player.fm/ep3.m4a">ep 3</a>
  <a class="dup" href="https://cdn.player.fm/ep3.m4a">ep 3 again</a>
</body></html>
"""

XMLY_PAGE1 = """
<html><body>
  <a href="/album/101">album A</a>
  <a href="/album/202">album B</a>
  <a href="/album/not-an-id/x">bogus</a>
  <a class="page-link" href="/category/a1001?page=2">2</a>
</body></html>
"""

XMLY_PAGE2 = """
<html><body>
  <a href="/album/303">album C</a>
</body></html>
"""


def test_playerfm_extraction_dedupes_pairs():
    # each episode URL appears twice (reference spider.py:48-53 `i = 1-i`)
    urls = extract_playerfm_audio_urls(PLAYERFM_HTML)
    assert urls == [
        "https://cdn.player.fm/ep1.m4a",
        "https://cdn.player.fm/ep2.m4a",
        "https://cdn.player.fm/ep3.m4a",
    ]


def test_crawl_playerfm_uses_injected_fetcher():
    seen = []

    def fetch(url):
        seen.append(url)
        return PLAYERFM_HTML

    urls = crawl_playerfm("https://zh.player.fm/series/fm-59854", fetch)
    assert seen == ["https://zh.player.fm/series/fm-59854"]
    assert len(urls) == 3


def test_xmly_pagination_walk():
    assert parse_xmly_album_links(XMLY_PAGE1) == ["/album/101", "/album/202"]
    assert parse_xmly_next_page(XMLY_PAGE1, 2) == "/category/a1001?page=2"
    assert parse_xmly_next_page(XMLY_PAGE2, 3) is None

    pages = {
        "https://www.ximalaya.com/category/a1001": XMLY_PAGE1,
        "https://www.ximalaya.com/category/a1001?page=2": XMLY_PAGE2,
    }
    links = crawl_xmly("https://www.ximalaya.com/category/a1001",
                       pages.__getitem__, num_pages=50)
    assert links == ["/album/101", "/album/202", "/album/303"]


def test_total_duration_counts_wavs(tmp_path):
    import struct
    import wave

    for name, secs in (("a.wav", 1.0), ("b.wav", 0.5)):
        with wave.open(str(tmp_path / name), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(struct.pack("<h", 0) * int(16000 * secs))
    np.testing.assert_allclose(total_duration(str(tmp_path)), 1.5, atol=0.01)
