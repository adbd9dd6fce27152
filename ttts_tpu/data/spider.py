"""Dataset acquisition tooling (reference ttts/spider/).

The reference crawls podcast audio with selenium (spider.py: zh.player.fm)
and Ximalaya via xmlyfetcher (xmly_spider.py), plus a bulk downloader
(download.py) and total-duration accounting (duration_calc.sh). Crawling is
pure host-side tooling with heavyweight optional deps; here:

  - `download(urls, out_dir)` — plain HTTP fetcher (urllib, no extra deps)
  - `total_duration(dir)` — ffprobe-free duration accounting via WAV headers
  - `crawl_playerfm(...)` — gated on selenium being installed

usage: python -m ttts_tpu.data.spider duration --dir clips/
"""

from __future__ import annotations

import argparse
import pathlib
import urllib.request
from typing import Iterable, List

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


def crawl_playerfm(series_url: str, out_dir: str):  # pragma: no cover
    """Gated selenium crawler (reference spider.py)."""
    try:
        from selenium import webdriver  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "selenium is not installed in this image; install it on a crawl "
            "host to use crawl_playerfm"
        ) from e
    raise NotImplementedError(
        "site-specific crawling is environment-dependent; use download() with "
        "a URL list, or port the reference's selenium flow on a crawl host"
    )


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
