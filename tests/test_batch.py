"""Batch throughput mode: thread-pooled full pipelines must produce outputs
byte-identical to sequential single-image runs."""

from __future__ import annotations

import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from plotweave.config import load_config
from plotweave.pipeline import run_pipeline, run_pipeline_batch


def _make_image(path: Path, seed: int) -> None:
    rng = np.random.default_rng(seed)
    img = np.zeros((120, 160, 3), np.uint8)
    img[:, :] = (235, 230, 225)
    colors = [(20, 20, 20), (40, 60, 200), (140, 180, 220)]
    for _ in range(10):
        c = colors[int(rng.integers(0, 3))]
        x, y = int(rng.integers(0, 160)), int(rng.integers(0, 120))
        r = int(rng.integers(6, 30))
        cv2.circle(img, (x, y), r, c, -1)
    cv2.imwrite(str(path), img)


def _cfg(img: Path, out: Path) -> dict:
    return {
        "input_image": str(img),
        "output_dir": str(out),
        "colors": [[20, 20, 20], [40, 60, 200], [140, 180, 220], [235, 230, 225]],
        "color_names": ["layer_dark", "layer_mid", "layer_skin", "layer_light"],
        "target_width_mm": 80,
        "target_height_mm": 60,
        "pixels_per_mm": 2,
        "pen_width_px": 8,
        "pen_radius_px": 4,
    }


@pytest.mark.parametrize("workers", [3])
def test_batch_equals_sequential(tmp_path, workers):
    imgs = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        _make_image(p, seed=10 + i)
        imgs.append(p)

    def build(tag):
        cfgs = []
        for i, img in enumerate(imgs):
            out = tmp_path / tag / f"run{i}"
            out.mkdir(parents=True)
            (out / "config.json").write_text(json.dumps(_cfg(img, out)))
            cfgs.append(load_config(str(out / "config.json")))
        return cfgs

    seq = build("seq")
    for c in seq:
        run_pipeline(c, 1, 13)
    par = build("par")
    times = run_pipeline_batch(par, 1, 13, workers=workers)
    assert len(times) == 3

    for a, b in zip(seq, par):
        sa = (Path(a.output_dir) / "plot_stream.bin").read_bytes()
        sb = (Path(b.output_dir) / "plot_stream.bin").read_bytes()
        assert sa == sb
        for layer in ["layer_dark", "layer_mid", "layer_skin", "layer_light"]:
            ma = cv2.imread(str(Path(a.output_dir) / layer / "mask.png"), cv2.IMREAD_GRAYSCALE)
            mb = cv2.imread(str(Path(b.output_dir) / layer / "mask.png"), cv2.IMREAD_GRAYSCALE)
            assert ma is not None and mb is not None and (ma == mb).all()


def test_batch_mesh_dp_byte_identical(tmp_path, capsys):
    """The PRODUCTION batch runner with mesh data-parallelism (round-2
    verdict #3): per-image fused 02→04 chain dispatches must rendezvous into
    shard_map batches over the 8-device CPU mesh, and every artifact must
    stay byte-equal to sequential single-image runs."""
    import re

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")

    imgs = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        _make_image(p, seed=40 + i)
        imgs.append(p)

    def build(tag):
        cfgs = []
        for i, img in enumerate(imgs):
            out = tmp_path / tag / f"run{i}"
            out.mkdir(parents=True)
            (out / "config.json").write_text(json.dumps(_cfg(img, out)))
            cfgs.append(load_config(str(out / "config.json")))
        return cfgs

    seq = build("seq")
    for c in seq:
        run_pipeline(c, 1, 13)
    par = build("par")
    times = run_pipeline_batch(par, 1, 13, workers=4, mesh_dp=True)
    assert all(t > 0 for t in times)

    out = capsys.readouterr().out
    assert "[batch] mesh data-parallelism over" in out
    m = re.search(r"mesh-DP: (\d+) image chain\(s\) in (\d+) batched dispatch", out)
    assert m, "mesh-DP summary line missing"
    n_images, n_dispatches = int(m.group(1)), int(m.group(2))
    assert n_images == 4, "every image's chain must go through the batcher"
    assert 1 <= n_dispatches <= 4

    for a, b in zip(seq, par):
        sa = (Path(a.output_dir) / "plot_stream.bin").read_bytes()
        sb = (Path(b.output_dir) / "plot_stream.bin").read_bytes()
        assert sa == sb
        pa = json.loads((Path(a.output_dir) / "palette_by_name.json").read_text())
        pb = json.loads((Path(b.output_dir) / "palette_by_name.json").read_text())
        assert pa == pb
        for layer in ["layer_dark", "layer_mid", "layer_skin", "layer_light"]:
            ma = cv2.imread(str(Path(a.output_dir) / layer / "mask.png"), cv2.IMREAD_GRAYSCALE)
            mb = cv2.imread(str(Path(b.output_dir) / layer / "mask.png"), cv2.IMREAD_GRAYSCALE)
            assert ma is not None and mb is not None and (ma == mb).all()
            ea = cv2.imread(str(Path(a.output_dir) / layer / "edges.png"), cv2.IMREAD_GRAYSCALE)
            eb = cv2.imread(str(Path(b.output_dir) / layer / "edges.png"), cv2.IMREAD_GRAYSCALE)
            assert ea is not None and eb is not None and (ea == eb).all()


def test_batch_mesh_dp_mixed_shapes(tmp_path, capsys):
    """Mixed-shape batches form one rendezvous group per chain shape; group
    leaders dispatch with the batcher lock RELEASED (a cold shard_map compile
    can take minutes — other keys' submissions and image_finished must not
    stall behind it), and results stay byte-equal to sequential runs."""
    import re

    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend")

    def make_sized(path: Path, seed: int, h: int, w: int) -> None:
        rng = np.random.default_rng(seed)
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :] = (235, 230, 225)
        colors = [(20, 20, 20), (40, 60, 200), (140, 180, 220)]
        for _ in range(10):
            c = colors[int(rng.integers(0, 3))]
            x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
            cv2.circle(img, (x, y), int(rng.integers(6, 30)), c, -1)
        cv2.imwrite(str(path), img)

    shapes = [(120, 160), (120, 160), (96, 128), (96, 128)]
    imgs = []
    for i, (h, w) in enumerate(shapes):
        p = tmp_path / f"img{i}.png"
        make_sized(p, seed=70 + i, h=h, w=w)
        imgs.append(p)

    def build(tag):
        cfgs = []
        for i, img in enumerate(imgs):
            out = tmp_path / tag / f"run{i}"
            out.mkdir(parents=True)
            (out / "config.json").write_text(json.dumps(_cfg(img, out)))
            cfgs.append(load_config(str(out / "config.json")))
        return cfgs

    seq = build("seq")
    for c in seq:
        run_pipeline(c, 1, 13)
    par = build("par")
    times = run_pipeline_batch(par, 1, 13, workers=4, mesh_dp=True)
    assert all(t > 0 for t in times)

    out = capsys.readouterr().out
    m = re.search(r"mesh-DP: (\d+) image chain\(s\) in (\d+) batched dispatch", out)
    assert m, "mesh-DP summary line missing"
    assert int(m.group(1)) == 4
    assert int(m.group(2)) >= 2, "two chain shapes cannot share a dispatch"

    for a, b in zip(seq, par):
        sa = (Path(a.output_dir) / "plot_stream.bin").read_bytes()
        sb = (Path(b.output_dir) / "plot_stream.bin").read_bytes()
        assert sa == sb


def test_batch_single_device_rendezvous_byte_identical(tmp_path, capsys):
    """ONE-device rendezvous (round-3 verdict #1): on a single chip the
    batcher must still engage, grouping concurrent per-image chain
    dispatches into batched programs (padded to power-of-two group rows,
    padding discarded) — and stay byte-equal to sequential runs."""
    import re

    import jax

    imgs = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        _make_image(p, seed=90 + i)
        imgs.append(p)

    def build(tag):
        cfgs = []
        for i, img in enumerate(imgs):
            out = tmp_path / tag / f"run{i}"
            out.mkdir(parents=True)
            (out / "config.json").write_text(json.dumps(_cfg(img, out)))
            cfgs.append(load_config(str(out / "config.json")))
        return cfgs

    seq = build("seq")
    for c in seq:
        run_pipeline(c, 1, 13)
    par = build("par")
    times = run_pipeline_batch(par, 1, 13, workers=4, devices=jax.devices()[:1])
    assert all(t > 0 for t in times)

    out = capsys.readouterr().out
    assert "[batch] mesh data-parallelism over 1 device(s)" in out
    m = re.search(r"mesh-DP: (\d+) image chain\(s\) in (\d+) batched dispatch", out)
    assert m, "rendezvous summary line missing"
    assert int(m.group(1)) == 4, "every image's chain must go through the batcher"
    assert int(m.group(2)) < 4, "4 images on 1 device must share dispatches"

    for a, b in zip(seq, par):
        sa = (Path(a.output_dir) / "plot_stream.bin").read_bytes()
        sb = (Path(b.output_dir) / "plot_stream.bin").read_bytes()
        assert sa == sb
        for layer in ["layer_dark", "layer_mid", "layer_skin", "layer_light"]:
            ma = cv2.imread(str(Path(a.output_dir) / layer / "mask.png"), cv2.IMREAD_GRAYSCALE)
            mb = cv2.imread(str(Path(b.output_dir) / layer / "mask.png"), cv2.IMREAD_GRAYSCALE)
            assert ma is not None and mb is not None and (ma == mb).all()


def test_batch_isolates_failures(tmp_path, capsys):
    """A bad image must not abort the other images in the batch."""
    good = tmp_path / "good.png"
    _make_image(good, seed=1)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")

    import json

    cfgs = []
    for img in (bad, good):
        out = tmp_path / f"out_{img.stem}"
        out.mkdir()
        (out / "config.json").write_text(json.dumps(_cfg(img, out)))
        cfgs.append(load_config(str(out / "config.json")))
    times = run_pipeline_batch(cfgs, 1, 13, workers=2)
    assert times[0] < 0  # bad image reported as failed
    assert times[1] > 0  # good image completed
    assert (tmp_path / "out_good" / "plot_stream.bin").exists()


def test_empty_layer_pipeline_completes(tmp_path):
    """An image where one configured color never wins a cluster must still
    produce a valid stream (the reference crashes at step 09 on this)."""
    import json

    from plotweave.stream.decoder import StreamDecoder, replay

    img = np.zeros((80, 100, 3), np.uint8)
    img[:, :] = (235, 230, 225)
    cv2.circle(img, (50, 40), 18, (20, 20, 20), -1)  # only 2 tones present
    p = tmp_path / "two_tone.png"
    cv2.imwrite(str(p), img)
    out = tmp_path / "out"
    out.mkdir()
    (out / "config.json").write_text(json.dumps(_cfg(p, out)))
    run_pipeline(load_config(str(out / "config.json")), 1, 13)
    data = (out / "plot_stream.bin").read_bytes()
    dec = StreamDecoder(data)
    replay(dec, 10000, 10000)
    assert dec.stats.eof_seen and len(data) % 1024 == 0
