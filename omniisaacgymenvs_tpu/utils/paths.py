"""Checkpoint path resolution, incl. remote retrieval to a local cache.

Reference: utils/config_utils/path_utils.py:54-67 — `checkpoint=` accepts a
local path OR a remote (Nucleus) location that is downloaded once into
`checkpoints/` and used from there. The TPU build's checkpoints are orbax
DIRECTORIES, so the remote form is an http(s):// URL of a .tar.gz/.tgz/.zip
archive of one checkpoint directory; it is fetched once, unpacked under
checkpoints/<archive-stem>/, and reused on later runs (the reference's
download-once cache behavior).
"""

from __future__ import annotations

import os
import tarfile
import zipfile

CACHE_DIR = "checkpoints"


def _unpacked_root(extract_dir: str) -> str:
    """If the archive wrapped everything in one top-level directory,
    descend into it (tar czf ckpt.tar.gz my_ckpt/ style archives)."""
    entries = [e for e in os.listdir(extract_dir) if not e.startswith(".")]
    if len(entries) == 1:
        inner = os.path.join(extract_dir, entries[0])
        if os.path.isdir(inner):
            return inner
    return extract_dir


def retrieve_checkpoint_path(path: str) -> str:
    """Local paths pass through; http(s):// archive URLs are downloaded to
    checkpoints/ once and the unpacked directory path is returned
    (reference retrieve_checkpoint_path, path_utils.py:54-67)."""
    if not (path.startswith("http://") or path.startswith("https://")):
        return path

    import urllib.request

    fname = os.path.basename(path.split("?", 1)[0])
    stem = fname
    for suf in (".tar.gz", ".tgz", ".tar", ".zip"):
        if stem.endswith(suf):
            stem = stem[: -len(suf)]
            break
    else:
        raise ValueError(
            f"remote checkpoint must be a .tar.gz/.tgz/.tar/.zip archive "
            f"of an orbax checkpoint directory: {path}"
        )
    extract_dir = os.path.join(CACHE_DIR, stem)
    if os.path.isdir(extract_dir) and os.listdir(extract_dir):
        return _unpacked_root(extract_dir)  # cached from an earlier run

    os.makedirs(CACHE_DIR, exist_ok=True)
    # atomic cache writes: download and extract into .part names and
    # os.rename into place only on success — an interrupted download or
    # half-finished extraction must not poison the cache (the campaign
    # runners' retry loops would otherwise re-fail on the corrupt artifact
    # until someone hand-deletes it)
    archive = os.path.join(CACHE_DIR, fname)
    if not os.path.exists(archive):
        tmp_archive = archive + ".part"
        print(f"downloading checkpoint {path} -> {archive}")
        try:
            urllib.request.urlretrieve(path, tmp_archive)
            os.rename(tmp_archive, archive)
        finally:
            if os.path.exists(tmp_archive):
                os.remove(tmp_archive)
    tmp_extract = extract_dir + ".part"
    if os.path.isdir(tmp_extract):
        import shutil

        shutil.rmtree(tmp_extract)
    os.makedirs(tmp_extract)
    try:
        if fname.endswith(".zip"):
            with zipfile.ZipFile(archive) as z:
                z.extractall(tmp_extract)
        else:
            with tarfile.open(archive) as t:
                t.extractall(tmp_extract, filter="data")
        os.rename(tmp_extract, extract_dir)
    except Exception as e:
        import shutil

        shutil.rmtree(tmp_extract, ignore_errors=True)
        if isinstance(e, (tarfile.TarError, zipfile.BadZipFile)):
            # corrupt archive: drop it so the next attempt re-downloads
            # instead of re-failing on the same bytes
            os.remove(archive)
        raise
    return _unpacked_root(extract_dir)
