"""Data subsystem: seg-map assembly, bbox sanitation, tar streaming,
web dataset processing, collate (SURVEY §2.3 parity)."""

import io
import os
import tarfile

import numpy as np
import pytest

from mas_tpu.data.dataset import (PreprocessedWebDataset, SyntheticImgBatches,
                                  SyntheticSegBatches, SyntheticTokenBatches,
                                  batch_iterator, collate, decode_jpg,
                                  smallest_max_size)
from mas_tpu.data.segmap import (EDGE_CHANNEL, FACE_SLICE, HUMAN_SLICE,
                                 NUM_SEG_CHANNELS, PANOPTIC_SLICE,
                                 assemble_seg_map, one_hot_seg, pad_boxes,
                                 sanitize_bboxes)
from mas_tpu.data.tario import iter_tar_samples, shard_split


def test_seg_map_channel_layout():
    h = w = 4
    pan = np.full((h, w), -1, np.int64)
    pan[0, 0] = 0       # panoptic class 0 -> channel 0
    pan[1, 1] = 132     # last panoptic class -> channel 132
    hum = np.full((h, w), -1, np.int64)
    hum[2, 2] = 0       # human class 0 -> channel 133
    face = np.zeros((h, w), np.int64)
    face[3, 3] = 5      # face class 5 -> channel 157
    edge_p = np.zeros((h, w)); edge_p[0, 1] = 1
    edge_h = np.zeros((h, w)); edge_h[0, 1] = 1

    m = assemble_seg_map(pan, edge_p, hum, edge_h, face)
    assert m.shape == (h, w, NUM_SEG_CHANNELS)
    assert m[0, 0, 0] == 1 and m[1, 1, 132] == 1
    assert m[2, 2, 133] == 1
    assert m[3, 3, 157] == 1
    # unlabeled pixels -> all-zero in their group
    assert m[0, 1, PANOPTIC_SLICE].sum() == 0
    assert m[0, 0, HUMAN_SLICE].sum() == 0
    assert m[0, 0, FACE_SLICE].sum() == 0
    # edge = sum of the two maps (reference keeps the 2.0)
    assert m[0, 1, EDGE_CHANNEL] == 2.0


def test_one_hot_seg_matches_numpy():
    rng = np.random.default_rng(0)
    pan = rng.integers(-1, 133, (8, 8))
    hum = rng.integers(-1, 20, (8, 8))
    face = rng.integers(0, 6, (8, 8))
    ep = rng.integers(0, 2, (8, 8))
    eh = rng.integers(0, 2, (8, 8))
    a = assemble_seg_map(pan, ep, hum, eh, face)
    b = np.asarray(one_hot_seg(pan, ep, hum, eh, face))
    np.testing.assert_array_equal(a, b)


def test_sanitize_bboxes():
    boxes = [
        [-5, -5, 100, 100],     # clamps to 0
        [10, 10, 20, 20],       # too small (<16) -> dropped
        [500, 10, 600, 100],    # clamps right to 511, 11px wide -> dropped
        [0, 0, 600, 600],       # clamps to frame
        [50, 50, 40, 60],       # inverted -> dropped
    ]
    out = sanitize_bboxes(boxes, frame=512)
    assert out == [[0.0, 0.0, 100.0, 100.0], [0.0, 0.0, 511.0, 511.0]]


def test_pad_boxes():
    arr = pad_boxes([[1, 2, 3, 4], [5, 6, 7, 8], [9, 9, 9, 9]], 2)
    assert arr.shape == (2, 4)
    np.testing.assert_array_equal(arr[0], [1, 2, 3, 4])


def _write_sample_tar(path, n_samples=3, res=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n_samples):
            key = f"{i:06d}"

            img = (rng.random((res + 10, res, 3)) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG")
            _add(tf, f"{key}.jpg", buf.getvalue())

            npz_buf = io.BytesIO()
            np.savez(
                npz_buf,
                seg_panoptic=rng.integers(-1, 133, (res, res)),
                edge_panoptic=rng.integers(0, 2, (res, res)),
                seg_human=rng.integers(-1, 20, (res, res)),
                edge_human=rng.integers(0, 2, (res, res)),
                seg_face=rng.integers(0, 6, (res, res)),
                box_things=np.array([[2, 2, 40, 40]], np.float32),
                box_face=np.zeros((0, 4), np.float32))
            _add(tf, f"{key}.npz", npz_buf.getvalue())
            _add(tf, f"{key}.txt", f"caption {i}".encode())


def _add(tf, name, data):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def test_tar_streaming_groups_by_key(tmp_path):
    tar = str(tmp_path / "shard0.tar")
    _write_sample_tar(tar)
    samples = list(iter_tar_samples(tar))
    assert len(samples) == 3
    assert set(samples[0]) >= {"jpg", "npz", "txt", "__key__"}
    assert samples[1]["__key__"] == "000001"


def test_shard_split_partitions_exactly():
    shards = [f"s{i}" for i in range(13)]
    seen = []
    for p in range(2):
        for w in range(3):
            seen += shard_split(shards, p, 2, worker=w, num_workers=3)
    assert sorted(seen) == sorted(shards)


def test_web_dataset_end_to_end(tmp_path):
    tar = str(tmp_path / "shard0.tar")
    _write_sample_tar(tar, res=64)
    ds = PreprocessedWebDataset(tar, resolution=64)
    samples = list(ds)
    assert len(samples) == 3
    s = samples[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["mask"].shape == (64, 64, NUM_SEG_CHANNELS)
    assert s["caption"] == "caption 0"
    assert all(len(b) == 4 for b in s["box_things"])

    batch = collate(samples[:2], max_boxes=4)
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["mask"].shape == (2, 64, 64, NUM_SEG_CHANNELS)
    assert batch["bbox_obj"].shape == (2, 4, 4)


def test_web_dataset_parallel_workers_preserve_order(tmp_path):
    """workers=4 must yield exactly the same samples, in the same order,
    as the inline single-threaded path (workers=0)."""
    tar = str(tmp_path / "shard0.tar")
    _write_sample_tar(tar, n_samples=8, res=64)
    inline = list(PreprocessedWebDataset(tar, resolution=64, workers=0))
    threaded = list(PreprocessedWebDataset(tar, resolution=64, workers=4))
    assert len(inline) == len(threaded) == 8
    for a, b in zip(inline, threaded):
        assert a["caption"] == b["caption"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_parallel_map_propagates_errors_and_skips():
    from mas_tpu.data.prefetch import parallel_map

    def f(x):
        if x == 5:
            raise ValueError("boom")
        return x * 2

    out = []
    with pytest.raises(ValueError):
        for y in parallel_map(f, range(10), workers=3):
            out.append(y)
    assert out == [0, 2, 4, 6, 8]   # order preserved up to the failure


def test_web_dataset_resizes_mask_with_image(tmp_path):
    """Non-square, non-target-res source: mask must be resized+center-cropped
    jointly with the image (reference dataset_preprocessor_web.py:36-38)."""
    from PIL import Image

    res, h0, w0 = 64, 90, 70
    tar = str(tmp_path / "shard0.tar")
    img = np.zeros((h0, w0, 3), np.uint8)
    # panoptic class 5 (mask channel index 5: the +1 shift is cancelled by
    # dropping the null channel) fills exactly the top half of the source
    seg = np.full((h0, w0), -1, np.int64)
    seg[:h0 // 2] = 5
    with tarfile.open(tar, "w") as tf:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG")
        _add(tf, "000000.jpg", buf.getvalue())
        npz_buf = io.BytesIO()
        np.savez(npz_buf, seg_panoptic=seg,
                 edge_panoptic=np.zeros((h0, w0), np.int64),
                 seg_human=np.full((h0, w0), -1, np.int64),
                 edge_human=np.zeros((h0, w0), np.int64),
                 seg_face=np.zeros((h0, w0), np.int64),
                 box_things=np.zeros((0, 4), np.float32),
                 box_face=np.zeros((0, 4), np.float32))
        _add(tf, "000000.npz", npz_buf.getvalue())

    (s,) = list(PreprocessedWebDataset(tar, resolution=res))
    assert s["image"].shape == (res, res, 3)
    assert s["mask"].shape == (res, res, NUM_SEG_CHANNELS)
    # source is taller than wide: scale = 64/70, resized (82, 64), crop rows
    # [9, 73); the class-5 stripe covers source rows [0, 45) -> resized rows
    # [0, ~41) -> cropped rows [0, ~32): the top ~half must be class 5 and
    # the bottom ~half null
    ch5 = s["mask"][..., 5]
    frac = ch5.mean()
    assert 0.4 < frac < 0.6, frac
    assert ch5[:16].all(), "top quarter should be class 5"
    assert not ch5[-16:].any(), "bottom quarter should be null"


def test_pipe_url_streaming(tmp_path):
    tar = str(tmp_path / "shard0.tar")
    _write_sample_tar(tar)
    samples = list(iter_tar_samples(f"pipe:cat {tar}"))
    assert len(samples) == 3


def _zombie_children():
    """PIDs of direct children of this process in state Z (unreaped)."""
    import os

    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                fields = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue
        state, ppid = fields[0], int(fields[1])
        if ppid == os.getpid() and state == "Z":
            out.append(int(pid))
    return out


def test_pipe_subprocess_reaped_on_eof(tmp_path):
    """Draining a ``pipe:`` shard must reap the child — one zombie per
    shard otherwise accumulates over a long preprocessing run."""
    tar = str(tmp_path / "shard0.tar")
    _write_sample_tar(tar)
    before = set(_zombie_children())
    list(iter_tar_samples(f"pipe:cat {tar}"))
    assert set(_zombie_children()) <= before


def test_pipe_subprocess_reaped_on_early_close(tmp_path):
    """Closing the generator early (downstream break) terminates and reaps
    a still-running pipe command instead of blocking or leaking it."""
    import time

    tar = str(tmp_path / "shard0.tar")
    _write_sample_tar(tar)
    before = set(_zombie_children())
    # command keeps running after the tar bytes are written
    it = iter_tar_samples(f"pipe:cat {tar}; sleep 60")
    next(it)
    t0 = time.monotonic()
    it.close()  # must terminate+wait the child, not block on sleep
    assert time.monotonic() - t0 < 30
    assert set(_zombie_children()) <= before


def test_synthetic_batches():
    seg = next(iter(SyntheticSegBatches(2, resolution=32)))
    assert seg["mask"].shape == (2, 32, 32, NUM_SEG_CHANNELS)
    # one-hot-ish: per-group sums <= 1
    assert seg["mask"][..., :133].sum(-1).max() <= 1

    img = next(iter(SyntheticImgBatches(2, resolution=64, max_boxes=3)))
    assert img["image"].shape == (2, 64, 64, 3)
    assert img["bbox_obj"].shape == (2, 3, 4)

    from mas_tpu.utils.config import TransformerConfig
    cfg = TransformerConfig(image_tokens_per_dim=4, seg_tokens_per_dim=2,
                            text_length=8, text_vocab_size=64,
                            hidden_dim=64, num_attn_heads=4)
    tok = next(iter(SyntheticTokenBatches(2, cfg)))
    assert tok["text"].shape == (2, 8)
    assert tok["seg"].shape == (2, 4)
    assert tok["image"].shape == (2, 16)
    assert tok["image"].max() < cfg.image_vocab_size


def test_batch_iterator_drops_last():
    ds = [dict(image=np.zeros((8, 8, 3), np.float32)) for _ in range(5)]
    batches = list(batch_iterator(ds, 2, need_seg=False))
    assert len(batches) == 2


def test_concat_dataset():
    from mas_tpu.data.dataset import ConcatDataset

    a = [dict(i=0), dict(i=1)]
    b = [dict(i=2), dict(i=3), dict(i=4)]
    c = ConcatDataset([a, b])
    assert len(c) == 5
    assert c[0]["i"] == 0 and c[2]["i"] == 2 and c[4]["i"] == 4
    assert c[-1]["i"] == 4
    assert c.get_true_idx(3) == (1, 1)


def test_url_dataset_uses_cached_images(tmp_path):
    """URLImageDataset skips downloading when the image is already cached
    (zero-egress test: only the cache path is exercised)."""
    import numpy as np
    from PIL import Image

    from mas_tpu.data.dataset import URLImageDataset
    from mas_tpu.data.preprocess import SyntheticAnnotator, preprocess_local

    img_dir = tmp_path / "imgs"; img_dir.mkdir()
    Image.fromarray((np.random.default_rng(0).random((40, 40, 3)) * 255
                     ).astype(np.uint8)).save(img_dir / "cap0.jpg")
    pre = tmp_path / "pre"
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    preprocess_local([str(img_dir / "cap0.jpg")], str(pre), anns)

    manifest = tmp_path / "list.tsv"
    manifest.write_text("http://unreachable.invalid/x.jpg\tcap0\n")
    ds = URLImageDataset(str(manifest), str(img_dir), str(pre),
                         resolution=32)
    sample = ds[0]
    assert sample["image"].shape == (32, 32, 3)
    assert sample["mask"].shape[-1] == 159


def test_cli_local_npz_data_iter(tmp_path):
    """The reference's local mode (COCO image dir + per-image annotator
    npz, conf/seg_config.yaml) through the CLI data dispatch: shuffled
    infinite epochs over PreprocessedLocalDataset."""
    import numpy as np
    from PIL import Image

    from mas_tpu.cli import _data_iter
    from mas_tpu.data.preprocess import SyntheticAnnotator, preprocess_local

    img_dir = tmp_path / "imgs"; img_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = img_dir / f"im{i}.jpg"
        Image.fromarray((rng.random((40, 48, 3)) * 255
                         ).astype(np.uint8)).save(p)
        paths.append(str(p))
    pre = tmp_path / "pre"
    anns = {k: SyntheticAnnotator(k) for k in ("panoptic", "human", "face")}
    preprocess_local(paths, str(pre), anns)

    it = _data_iter({"kind": "local_npz", "image_dir": str(img_dir),
                     "preprocessed_dir": str(pre), "resolution": 32},
                    "pretrain_segmentation", 2)
    b1 = next(it)
    assert b1["image"].shape == (2, 32, 32, 3)
    assert b1["mask"].shape == (2, 32, 32, 159)
    assert b1["bbox_obj"].shape == (2, 6, 4)
    # 3 samples/epoch with batch 2: the second batch spans the epoch
    # boundary, proving the wrapper reshuffles and continues forever
    b2 = next(it)
    assert b2["image"].shape == (2, 32, 32, 3)


def test_edges_from_instances():
    from mas_tpu.data.segmap import edges_from_instances

    m = np.zeros((6, 6), np.int32)
    m[2:4, 2:4] = 7
    e = edges_from_instances(m)
    # boundary pixels on both sides of the label change are edges
    assert e[2, 2] == 1 and e[1, 2] == 1 and e[2, 1] == 1
    assert e[0, 0] == 0 and e[5, 5] == 0
    # uniform map has no edges
    assert edges_from_instances(np.ones((4, 4))).sum() == 0


def test_prefetch_iterator():
    from mas_tpu.data.prefetch import prefetch

    out = list(prefetch(iter(range(7)), size=2))
    assert out == list(range(7))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_assemble_into_prev_clear_matches_fresh():
    """Buffer reuse with incremental clearing must equal fresh assembly."""
    import numpy as np

    from mas_tpu.data.segmap import (assemble_seg_map,
                                     assemble_seg_map_into)

    rng = np.random.default_rng(7)

    def labels():
        return (rng.integers(-1, 133, (32, 32)),
                rng.integers(0, 2, (32, 32)),
                rng.integers(-1, 20, (32, 32)),
                rng.integers(0, 2, (32, 32)),
                rng.integers(0, 6, (32, 32)))

    buf = np.zeros((32, 32, 159), np.float32)
    prev = None
    for _ in range(4):
        lab = labels()
        prev = assemble_seg_map_into(buf, *lab, prev=prev)
        np.testing.assert_array_equal(buf, assemble_seg_map(*lab))


def test_structured_cached_batches_cycle_and_align():
    import numpy as np

    from mas_tpu.data.dataset import StructuredSceneBatches

    it = iter(StructuredSceneBatches(4, 64, seed=3, cache_scenes=8))
    seen = []
    for _ in range(12):        # cycles the 8-scene pool + reuses buffers
        b = next(it)
        assert b["mask"].shape == (4, 64, 64, 159)
        assert b["image"].dtype == np.float32
        # one-hot invariants survive buffer reuse
        assert b["mask"][..., :133].sum(-1).max() <= 1.0
        assert b["mask"][..., 153:158].sum(-1).max() <= 1.0
        seen.append(b["image"].sum())
    assert len(set(np.round(seen, 3))) > 1   # batches vary


def test_structured_batches_image_u8_aligned():
    """image_u8=True ships uint8 [0,255]; /255 matches the float stream
    (cached pools store uint8 internally either way, so the cached paths
    are bit-exact; the fresh path is within one quantization step)."""
    import numpy as np

    from mas_tpu.data.dataset import StructuredSceneBatches

    kw = dict(resolution=32, seed=11, cache_scenes=8)
    bu = next(iter(StructuredSceneBatches(4, image_u8=True, **kw)))
    bf = next(iter(StructuredSceneBatches(4, **kw)))
    assert bu["image"].dtype == np.uint8
    np.testing.assert_allclose(bu["image"].astype(np.float32) / 255.0,
                               bf["image"], atol=1e-7)
    np.testing.assert_array_equal(bu["mask"], bf["mask"])

    fu = next(iter(StructuredSceneBatches(2, resolution=32, seed=5,
                                          image_u8=True)))
    ff = next(iter(StructuredSceneBatches(2, resolution=32, seed=5)))
    assert fu["image"].dtype == np.uint8
    np.testing.assert_allclose(fu["image"].astype(np.float32) / 255.0,
                               ff["image"], atol=1.01 / 255)


def test_scene_pool_disk_cache(tmp_path):
    """pool_cache_dir: second instance mmap-loads the saved pool instead
    of regenerating (the 512² pool costs 40+ CPU-minutes; tail-9
    postmortem).  v2 format: a versioned directory of plain .npy files —
    never pickle (ADVICE r4), so a planted cache file can't execute code."""
    from mas_tpu.data.dataset import StructuredSceneBatches

    d = str(tmp_path)
    it1 = StructuredSceneBatches(2, 32, seed=7, cache_scenes=4,
                                 compact=True, pool_cache_dir=d)
    b1 = next(iter(it1))
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].is_dir() and \
        files[0].name.startswith("scenes_v")
    assert all(p.suffix == ".npy" for p in files[0].iterdir())

    it2 = StructuredSceneBatches(2, 32, seed=7, cache_scenes=4,
                                 compact=True, pool_cache_dir=d)
    calls = []
    it2._scene = lambda: calls.append(1) or (_ for _ in ()).throw(
        AssertionError("pool should load from disk, not regenerate"))
    b2 = next(iter(it2))
    assert not calls
    # same scenes on disk: the pooled images come from the same pool
    # (order may differ — loading skips the generator's rng draws)
    assert b1["image"].shape == b2["image"].shape
    assert b2["seg_packed"].dtype == b1["seg_packed"].dtype

    # different key => different pool dir, fresh generation
    it3 = StructuredSceneBatches(2, 32, seed=8, cache_scenes=4,
                                 compact=True, pool_cache_dir=d)
    next(iter(it3))
    assert len(list(tmp_path.iterdir())) == 2

    # round-trip fidelity: the loaded view returns the same scene tuples
    # the generator saved (same seed regenerated without a cache dir)
    fresh = StructuredSceneBatches(2, 32, seed=7, cache_scenes=4,
                                   compact=True)
    b3 = next(iter(fresh))
    view = StructuredSceneBatches(2, 32, seed=7, cache_scenes=4,
                                  compact=True,
                                  pool_cache_dir=d)._load_pool()
    assert view is not None and len(view) == 4
    import numpy as np
    scene = view[1]
    assert len(scene) == 7
    assert scene[0].shape == (32, 32, 3) and scene[5].shape[-1:] == (4,)
    assert b3["seg_packed"].dtype == b1["seg_packed"].dtype
