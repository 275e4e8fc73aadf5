"""External ingest: HTTP download + zip extraction (SURVEY.md §2 O4;
reference ``Nomic MultiModal Retrieval.py``:126–151 ``download_file`` —
streamed ``requests.get`` of ``val2017.zip`` with a progress loop, then
``zipfile.extractall`` and removal of the archive).

This is a driver-side utility by nature (one archive, one destination —
the distributed work starts afterwards with the ``binaryFile`` scan over
the extracted directory). Kept faithful to the reference's behavior:
streamed chunks (never the whole body in memory), extract, delete the
archive. ``requests`` is import-gated — ``file://`` and local paths work
without it, so tests need no network.
"""

from __future__ import annotations

import os
import shutil
import zipfile
from urllib.parse import urlparse


def download_file(
    url: str,
    destination: str,
    chunk_size: int = 1 << 20,
    progress: bool = False,
) -> str:
    """Stream ``url`` to ``destination`` (a directory or file path);
    returns the downloaded file's path. Mirrors NMR:128–143: streamed
    chunks with optional progress reporting."""
    name = os.path.basename(urlparse(url).path) or "download"
    if os.path.isdir(destination):
        destination = os.path.join(destination, name)
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)

    parsed = urlparse(url)
    if parsed.scheme in ("", "file"):
        shutil.copyfile(parsed.path or url, destination)
        return destination

    try:
        import requests
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "HTTP download requires the requests package; pass a file:// "
            "URL or local path in this environment"
        ) from e
    with requests.get(url, stream=True, timeout=60) as r:  # pragma: no cover
        r.raise_for_status()
        done = 0
        with open(destination, "wb") as f:
            for chunk in r.iter_content(chunk_size=chunk_size):
                f.write(chunk)
                done += len(chunk)
                if progress:
                    print(f"\rdownloaded {done >> 20} MiB", end="")
        if progress:
            print()
    return destination


def extract_zip(
    zip_path: str, dest_dir: str, remove_archive: bool = True
) -> list[str]:
    """``zipfile.extractall`` + archive removal (NMR:146–149); refuses
    entries that would escape ``dest_dir`` (zip-slip — the reference
    trusts its fixed URL, a general utility must not). Returns the
    extracted paths."""
    os.makedirs(dest_dir, exist_ok=True)
    root = os.path.realpath(dest_dir)
    out = []
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            target = os.path.realpath(os.path.join(root, info.filename))
            if not (target == root or target.startswith(root + os.sep)):
                raise ValueError(f"unsafe zip entry: {info.filename!r}")
        zf.extractall(root)
        out = [os.path.join(root, n) for n in zf.namelist()]
    if remove_archive:
        os.remove(zip_path)
    return out


def fetch_and_extract(url: str, dest_dir: str, progress: bool = False) -> list[str]:
    """The reference's full O4 flow: download → unzip → delete archive →
    extracted file list, ready for ``ingest_binary_dir``."""
    os.makedirs(dest_dir, exist_ok=True)
    archive = download_file(url, dest_dir, progress=progress)
    return extract_zip(archive, dest_dir, remove_archive=True)
