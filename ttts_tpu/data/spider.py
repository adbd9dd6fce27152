"""Dataset acquisition tooling (reference ttts/spider/).

The reference crawls podcast audio with selenium (spider.py: zh.player.fm)
and Ximalaya via xmlyfetcher (xmly_spider.py), plus a bulk downloader
(download.py) and total-duration accounting (duration_calc.sh). Crawling is
pure host-side tooling with heavyweight optional deps; here:

  - `download(urls, out_dir)` — plain HTTP fetcher (urllib, no extra deps)
  - `total_duration(dir)` — ffprobe-free duration accounting via WAV headers
  - `crawl_playerfm` / `crawl_xmly` — the reference crawlers' extraction and
    pagination logic, stdlib-only (html.parser instead of BeautifulSoup),
    with the page fetcher INJECTED (`fetch(url) -> html`): a selenium driver
    on a crawl host, a stub in tests. The browser/binary drivers themselves
    (scrolling Chrome, xmlyfetcher) stay external, same process boundary as
    the reference.

usage: python -m ttts_tpu.data.spider duration --dir clips/
"""

from __future__ import annotations

import argparse
import pathlib
import re
import urllib.request
from html.parser import HTMLParser
from typing import Callable, Iterable, List

from ttts_tpu.utils.logging import get_logger

log = get_logger("spider")


def download(urls: Iterable[str], out_dir: str, timeout: float = 60.0) -> List[str]:
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for url in urls:
        name = url.rstrip("/").rsplit("/", 1)[-1] or "download"
        dst = out / name
        try:
            with urllib.request.urlopen(url, timeout=timeout) as r, open(dst, "wb") as f:
                f.write(r.read())
            written.append(str(dst))
        except Exception as e:  # pragma: no cover
            log.warning("failed %s: %s", url, e)
    return written


def total_duration(directory: str) -> float:
    """Total seconds of WAV audio under `directory` (duration_calc.sh
    equivalent, header-only — no decode)."""
    from ttts_tpu.data.audio import _native

    total = 0.0
    lib = _native()
    for p in pathlib.Path(directory).rglob("*.wav"):
        try:
            if lib is not None:
                info = lib.WavInfo()
                if lib.wav_info(str(p).encode(), __import__("ctypes").byref(info)) == 0:
                    total += info.frames / max(info.sample_rate, 1)
            else:
                import wave

                with wave.open(str(p)) as w:
                    total += w.getnframes() / max(w.getframerate(), 1)
        except Exception:
            continue
    return total


class _AnchorParser(HTMLParser):
    """Collect (href, class, text) for every <a> — stdlib-only replacement
    for the reference's BeautifulSoup queries."""

    def __init__(self):
        super().__init__()
        self.anchors: List[tuple] = []
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            d = dict(attrs)
            self._cur = [d.get("href"), d.get("class", ""), ""]

    def handle_data(self, data):
        if self._cur is not None:
            self._cur[2] += data

    def handle_endtag(self, tag):
        if tag == "a" and self._cur is not None:
            self.anchors.append(tuple(self._cur))
            self._cur = None


def _anchors(html: str) -> List[tuple]:
    p = _AnchorParser()
    p.feed(html)
    return p.anchors


def extract_playerfm_audio_urls(html: str) -> List[str]:
    """player.fm episode page → .m4a URLs (reference spider.py:45-54:
    `soup.select('a[href$=".m4a"]')` then keep every OTHER link — each
    episode's URL appears twice in the page, so the `i = 1-i` skip dedupes
    consecutive pairs)."""
    m4a = [h for h, _, _ in _anchors(html) if h and h.endswith(".m4a")]
    return m4a[::2]


def parse_xmly_album_links(html: str) -> List[str]:
    """Ximalaya category page → album hrefs (xmly_spider.py
    parse_album_links: anchors whose href matches /album/<id>)."""
    out = []
    for h, _, _ in _anchors(html):
        if h and re.search(r"/album/\d+$", h):
            out.append(h)
    return out


def parse_xmly_next_page(html: str, page_num: int) -> str | None:
    """Next-page href: the <a class="page-link"> whose TEXT is the page
    number (xmly_spider.py parse_next_page_link)."""
    for h, cls, text in _anchors(html):
        if "page-link" in (cls or "") and text.strip() == str(page_num):
            return h
    return None


def crawl_playerfm(series_url: str, fetch: Callable[[str], str]) -> List[str]:
    """player.fm series → audio URL list (reference spider.py flow minus the
    browser). `fetch(url) -> html` is injected: on a crawl host it can be a
    selenium driver that scrolls the page to force lazy loading (the
    reference presses END/PAGE_UP 50 times, spider.py:31-39); in tests it's
    a stub. This image has no selenium and zero egress, so no default."""
    return extract_playerfm_audio_urls(fetch(series_url))


def crawl_xmly(base_url: str, fetch: Callable[[str], str],
               num_pages: int = 50) -> List[str]:
    """Ximalaya category crawl → album links across paginated pages
    (xmly_spider.py get_all_album_links). Album DOWNLOAD stays external
    (the reference shells out to the `xmlyfetcher` binary per album id)."""
    links: List[str] = []
    page_url, page_count = base_url, 1
    while page_url and page_count < num_pages:
        html = fetch(page_url)
        links.extend(parse_xmly_album_links(html))
        nxt = parse_xmly_next_page(html, page_count + 1)
        page_url = f"https://www.ximalaya.com{nxt}" if nxt else None
        page_count += 1
    return links


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("download")
    s.add_argument("--url-list", required=True)
    s.add_argument("--out-dir", required=True)
    s = sub.add_parser("duration")
    s.add_argument("--dir", required=True)
    args = p.parse_args(argv)
    if args.cmd == "download":
        urls = [l.strip() for l in open(args.url_list) if l.strip()]
        written = download(urls, args.out_dir)
        log.info("downloaded %d/%d", len(written), len(urls))
    else:
        print(f"{total_duration(args.dir):.1f} seconds")


if __name__ == "__main__":
    main()
