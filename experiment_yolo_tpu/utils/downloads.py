"""Download/zip utilities (reference: ultralytics/utils/downloads.py:1-495).

Stdlib-only: urllib for transfers (supports http(s) AND file:// so
everything is testable offline), zipfile for archive handling, retry with
exponential backoff. No external network is assumed anywhere else in the
framework — these tools exist for parity with the reference's dataset /
asset onboarding flow and activate only when a user passes a URL.
"""

from __future__ import annotations

import re
import shutil
import time
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Iterable, Optional, Sequence

from experiment_yolo_tpu.utils import LOGGER

__all__ = [
    "is_url", "unzip_file", "zip_directory", "check_disk_space",
    "safe_download", "download", "delete_dsstore",
]

_EXCLUDE = (".DS_Store", "__MACOSX")


def is_url(url, check: bool = False) -> bool:
    """True if the string parses as a URL; with check=True, also reachable
    (reference downloads.py:32)."""
    try:
        url = str(url)
        result = urllib.parse.urlparse(url)
        ok = all([result.scheme, result.netloc or result.scheme == "file"])
        if not ok:
            return False
        if check:
            with urllib.request.urlopen(url, timeout=10) as resp:
                return getattr(resp, "status", 200) < 400
        return True
    except Exception:
        return False


def delete_dsstore(path, files_to_delete: Sequence[str] = _EXCLUDE) -> None:
    """Remove macOS metadata litter before zipping (downloads.py:61)."""
    for pat in files_to_delete:
        for f in Path(path).rglob(pat):
            f.unlink() if f.is_file() else shutil.rmtree(f)


def zip_directory(directory, compress: bool = True, exclude: Sequence[str] = _EXCLUDE) -> Path:
    """Zip a directory's contents into ``<directory>.zip`` (downloads.py:87)."""
    import zipfile

    delete_dsstore(directory)
    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"'{directory}' does not exist")
    files = [f for f in directory.rglob("*") if f.is_file() and not any(x in f.parts for x in exclude)]
    zip_file = directory.with_suffix(".zip")
    mode = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(zip_file, "w", mode) as zf:
        for f in files:
            zf.write(f, f.relative_to(directory))
    return zip_file


def unzip_file(file, path=None, exclude: Sequence[str] = _EXCLUDE, exist_ok: bool = False) -> Path:
    """Extract a zip, wrapping loose top-level files into a stem-named dir
    (the reference's safety behavior, downloads.py:126-187)."""
    import zipfile

    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as zf:
        names = [n for n in zf.namelist() if not any(x in n for x in exclude)]
        top = {Path(n).parts[0] for n in names if Path(n).parts}
        loose = [n for n in names if len(Path(n).parts) == 1 and not n.endswith("/")]
        if len(top) > 1 or loose:
            # files at the root (not one top-level dir): extract into <stem>/
            target = extract_path = path / file.stem
        else:
            extract_path = path
            target = path / next(iter(top)) if top else path
        if target.exists() and any(target.iterdir()) and not exist_ok:
            LOGGER.warning(f"unzip target {target} not empty, skipping extract")
            return target
        for n in names:
            zf.extract(n, extract_path)
    return target


def check_disk_space(required_bytes: float, path=Path.cwd(), sf: float = 1.5, hard: bool = True) -> bool:
    """Ensure free space for required_bytes * sf (downloads.py:190)."""
    total, used, free = shutil.disk_usage(path)
    if required_bytes * sf < free:
        return True
    msg = (f"insufficient disk space: need {required_bytes * sf / 1e9:.1f} GB "
           f"(x{sf} safety), have {free / 1e9:.1f} GB free at {path}")
    if hard:
        raise MemoryError(msg)
    LOGGER.warning(msg)
    return False


def safe_download(
    url: str,
    file=None,
    dir=None,
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
    exist_ok: bool = False,
    progress: bool = False,
):
    """Download with retries + optional unzip (downloads.py:269-365).

    Accepts http(s) and file:// URLs; verifies the artifact exceeds
    ``min_bytes``; on repeated failure raises ConnectionError. Returns the
    downloaded (or extracted) path.
    """
    f = Path(dir or ".") / (file or url2file(url))
    if not f.is_file():
        f.parent.mkdir(parents=True, exist_ok=True)
        desc = f"Downloading {url} to '{f}'"
        LOGGER.info(desc)
        for i in range(retry + 1):
            try:
                with urllib.request.urlopen(url, timeout=30) as resp:
                    length = int(resp.headers.get("Content-Length", 0) or 0)
                    if length:
                        check_disk_space(length, f.parent)
                    with open(f, "wb") as out:
                        shutil.copyfileobj(resp, out)
                if f.exists() and f.stat().st_size > min_bytes:
                    break
                f.unlink(missing_ok=True)
            except MemoryError:
                f.unlink(missing_ok=True)
                raise  # insufficient disk space is not retryable
            except Exception as e:
                f.unlink(missing_ok=True)
                if i >= retry:
                    raise ConnectionError(f"download failure for {url} after {retry} retries") from e
                time.sleep(2**i)  # exponential backoff
        else:
            raise ConnectionError(f"artifact below min_bytes after {retry} retries: {url}")

    if unzip and f.exists() and f.suffix in ("", ".zip", ".tar", ".gz"):
        if f.suffix == ".zip":
            out_dir = unzip_file(f, path=dir or f.parent, exist_ok=exist_ok)
        elif f.suffix in (".tar", ".gz"):
            import tarfile

            out_dir = Path(dir or f.parent)
            with tarfile.open(f) as tf:
                tf.extractall(out_dir, filter="data")
        else:
            return f
        if delete:
            f.unlink()
        return out_dir
    return f


def url2file(url: str) -> str:
    """URL -> local filename (query strings stripped, downloads.py:57)."""
    return Path(urllib.parse.unquote(urllib.parse.urlparse(str(url)).path)).name


def download(url, dir=Path.cwd(), unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3, exist_ok: bool = False):
    """Download one or many URLs, optionally in threads (downloads.py:454)."""
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            return list(pool.map(
                lambda u: safe_download(str(u), dir=dir, unzip=unzip, delete=delete,
                                        retry=retry, exist_ok=exist_ok), urls))
    return [safe_download(str(u), dir=dir, unzip=unzip, delete=delete, retry=retry,
                          exist_ok=exist_ok) for u in urls]
