"""Remote checkpoint retrieval (reference path_utils.py:54-67: a remote
`checkpoint=` is downloaded once into checkpoints/ and used locally).

Here the remote form is an http(s) URL of a .tar.gz of one orbax
checkpoint directory; these tests serve a real archive over a loopback
HTTP server and drive the actual train CLI eval path with it."""

import http.server
import json
import os
import socketserver
import tarfile
import threading

import pytest

pytestmark = pytest.mark.slow

CLI = [
    "task=Cartpole",
    "num_envs=32",
    "seed=7",
    "train.params.config.minibatch_size=256",
    "train.params.config.save_frequency=2",
    "train.params.config.save_best_after=1",
]


@pytest.fixture()
def served_dir(tmp_path):
    serve_root = tmp_path / "www"
    serve_root.mkdir()
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(serve_root), **kw
    )
    with socketserver.TCPServer(("127.0.0.1", 0), handler) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            yield serve_root, port
        finally:
            httpd.shutdown()


def test_remote_checkpoint_downloads_and_loads(
    tmp_path, monkeypatch, served_dir
):
    serve_root, port = served_dir
    monkeypatch.chdir(tmp_path)
    from omniisaacgymenvs_tpu.scripts import train

    # produce a checkpoint, archive it into the served dir
    train.main(CLI + ["max_iterations=4", "experiment=remote_src"])
    ckpt = tmp_path / "runs" / "remote_src" / "nn" / "last"
    with tarfile.open(serve_root / "cartpole_ckpt.tar.gz", "w:gz") as t:
        t.add(ckpt, arcname="cartpole_ckpt")

    url = f"http://127.0.0.1:{port}/cartpole_ckpt.tar.gz"
    # eval from the REMOTE checkpoint through the real CLI path
    train.main(CLI + ["test=True", "max_iterations=32", f"checkpoint={url}"])
    # downloaded + unpacked into the checkpoints/ cache
    cache = tmp_path / "checkpoints" / "cartpole_ckpt"
    assert cache.is_dir() and os.listdir(cache)

    # second use hits the cache (no re-download: kill the server first)
    from omniisaacgymenvs_tpu.utils.paths import retrieve_checkpoint_path

    p1 = retrieve_checkpoint_path(url)
    assert os.path.isdir(p1)


def test_non_archive_url_rejected(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from omniisaacgymenvs_tpu.utils.paths import retrieve_checkpoint_path

    with pytest.raises(ValueError, match="archive"):
        retrieve_checkpoint_path("http://example.invalid/ckpt.pth")


def test_local_paths_pass_through(tmp_path):
    from omniisaacgymenvs_tpu.utils.paths import retrieve_checkpoint_path

    assert retrieve_checkpoint_path("runs/Ant/nn/best") == "runs/Ant/nn/best"
