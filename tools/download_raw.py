"""Out-of-engine acquisition driver (SURVEY §2.1 S6).

The reference mirrors PubMed baseline+updatefiles, MeSH XML, and the
PubTator chemical stream with wget -c -N (reference
scripts/download_raw.sh:22-39). Per SURVEY, acquisition stays OUTSIDE
the engine: this script lands files into a directory layout the
engine's ingest (pipeline/*.py, streaming/incremental.py) consumes;
resume = skip files whose size matches the server's Content-Length
(the -c -N analogue). Pure stdlib; network use is the caller's
decision — `--dry-run` prints the plan only.

Usage:
  python tools/download_raw.py --dest data/raw [--dry-run] [url ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

DEFAULT_SOURCES = [
    # (relative landing dir, url) — the reference's three sources
    ("pubtator", "https://ftp.ncbi.nlm.nih.gov/pub/lu/PubTatorCentral/chemical2pubtator3.gz"),
    ("mesh", "https://nlmpubs.nlm.nih.gov/projects/mesh/MESH_FILES/xmlmesh/desc2025.xml"),
    ("mesh", "https://nlmpubs.nlm.nih.gov/projects/mesh/MESH_FILES/xmlmesh/supp2025.xml"),
    # pubmed baseline/updatefiles are directory listings; pass explicit
    # file urls on the command line (the reference crawls with wget -r)
]


def land(url: str, dest_dir: str, dry_run: bool) -> str:
    path = os.path.join(dest_dir, url.rsplit("/", 1)[-1].split("?")[0])
    if dry_run:
        print(f"WOULD FETCH {url} -> {path}")
        return path
    os.makedirs(dest_dir, exist_ok=True)
    if os.path.exists(path):
        # skip ONLY when the server confirms the local size; a failed
        # HEAD must not bless a possibly-truncated partial download
        try:
            with urllib.request.urlopen(
                urllib.request.Request(url, method="HEAD"), timeout=30
            ) as resp:
                remote_size = int(resp.headers.get("Content-Length", -1))
            if remote_size == os.path.getsize(path):
                print(f"SKIP (complete) {path}")
                return path
        except Exception as e:  # noqa: BLE001
            print(f"HEAD failed ({e}); refetching {url}")
    print(f"FETCH {url} -> {path}")
    # fetch to a temp name, rename on success — an interrupted run
    # never leaves a truncated file under the final name
    tmp = path + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, path)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="data/raw")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("urls", nargs="*", help="extra (sub)dir=url pairs or bare urls")
    args = ap.parse_args()

    plan: list[tuple[str, str]] = list(DEFAULT_SOURCES)
    for u in args.urls:
        # dir=url only when the value is itself a URL — bare URLs may
        # legitimately contain '=' in query strings
        sub, _, url = u.partition("=")
        if url.startswith(("http://", "https://", "ftp://")):
            plan.append((sub, url))
        else:
            plan.append(("pubmed", u))
    for sub, url in plan:
        land(url, os.path.join(args.dest, sub), args.dry_run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
