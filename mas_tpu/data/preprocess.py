"""Offline data factory: annotator fan-out + tar repacking.

Rebuilds the reference preprocessing subsystem (``/root/reference/Data/
preprocessor.py``, ``preprocessor_web.py``): run three annotators
(panoptic / human-parts / face) over an image corpus, persist per-image
npz results, and repack image+caption+annotations into processed tar shards
ready for ``PreprocessedWebDataset``.

This is host-side CPU tooling, not TPU runtime (SURVEY §2.5).  The original
annotators are heavyweight pretrained GPU nets (Detectron2 Panoptic-DeepLab,
SCHP, face_alignment) that are not present in this image and are *data
producers*, not framework components — the orchestration here accepts any
``Annotator`` callable, ships a ``SyntheticAnnotator`` for tests/benches,
and a ``TorchScriptAnnotator`` adapter for user-supplied serialized models.

Orchestration parity with the reference:
  * local mode: one process per (annotator x worker); each strides the
    dataset ``idx % total == pid`` (``preprocessor.py:91-93``), saves
    ``{name}_{kind}.npz`` (``preprocessor.py:94-99``),
  * web mode: per-annotator worker pools over shards, a coordinator that
    counts per-tar completions across all annotators via a ready-queue
    protocol ``{kind}/{worker}/{state}/{tar}`` and repacks a tar once all
    annotators report it done (``preprocessor_web.py:157-232``), merging
    jpg+txt+npz members into the output shard (``:234-268``);
    machine-level sharding via ``machine_idx``/``machines_total``
    (``conf/preprocess_data_web.yaml:13-14``).
"""

from __future__ import annotations

import io
import json
import multiprocessing as mp
import os
import tarfile
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .tario import expand_shards, iter_tar_samples

Annotator = Callable[[np.ndarray], Dict[str, np.ndarray]]

ANNOTATOR_KINDS = ("panoptic", "human", "face")


class SyntheticAnnotator:
    """Deterministic stand-in: fake NETWORK outputs, REAL schema-shaping
    geometry.  Only the pretrained net is substituted with random instance
    rectangles / landmarks; everything downstream (``panoptic_thing_boxes``,
    ``edges_from_instances``, ``faces_to_mask``) is the ported reference
    logic (``detectron2_preprocessor.py:84-103``,
    ``human_parts_preprocessor.py:78-101``,
    ``face_alignment_preprocessor.py:103-133``)."""

    def __init__(self, kind: str, seed: int = 0):
        assert kind in ANNOTATOR_KINDS
        self.kind = kind
        self.seed = seed

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        from .annotate import faces_to_mask, masks_to_boxes, \
            panoptic_thing_boxes
        from .segmap import edges_from_instances

        h, w = image.shape[:2]
        rng = np.random.default_rng(
            self.seed + int(image[:8, :8].sum() * 255) % 100003)
        if self.kind == "panoptic":
            # fake predictor output: 1000*class + instance rectangles
            # (stand-in for detectron2's panoptic map, :93-99)
            pan = np.full((h, w), 100 * 1000, np.int64)   # stuff background
            for inst in range(1, int(rng.integers(2, 5))):
                cls = int(rng.integers(0, 133))
                y, x = rng.integers(0, max(h - 8, 1)), rng.integers(
                    0, max(w - 8, 1))
                bh, bw = rng.integers(6, h // 2 + 7), rng.integers(
                    6, w // 2 + 7)
                pan[y:y + bh, x:x + bw] = cls * 1000 + inst
            return {
                "seg_panoptic": (pan // 1000).astype(np.int16),
                "edges": edges_from_instances(pan).astype(np.uint8),
                "box_things": panoptic_thing_boxes(pan),
            }
        if self.kind == "human":
            # fake NET logits at the LIP net's output resolution; the
            # logits->mask half of the ported transform chain is real
            # (human_parts_preprocessor.py:90-101).  prepare_human_input is
            # NOT run here — its output shape is static (473² regardless of
            # input) and it expects BGR [0,255], which synthetic RGB [0,1]
            # scenes aren't; the input-prep half has its own oracle test.
            from .annotate import (HUMAN_PARTS_CLASSES,
                                   HUMAN_PARTS_INPUT_SIZE,
                                   human_logits_to_mask)

            out_hw = HUMAN_PARTS_INPUT_SIZE[0] // 4 + 1      # SCHP os=4: 119
            logits = np.full((1, HUMAN_PARTS_CLASSES, out_hw, out_hw),
                             -4.0, np.float32)
            logits[:, 0] = 4.0                               # background
            for part in range(int(rng.integers(1, 4))):
                y, x = rng.integers(0, out_hw - 2), rng.integers(
                    0, out_hw - 2)
                bh, bw = rng.integers(2, out_hw // 2), rng.integers(
                    2, out_hw // 2)
                cls = int(rng.integers(1, HUMAN_PARTS_CLASSES))
                logits[0, cls, y:y + bh, x:x + bw] = 8.0
            parts = human_logits_to_mask(logits, h, w)[0].astype(np.int16)
            return {
                "seg_human": parts,
                "edges": edges_from_instances(parts).astype(np.uint8),
            }
        # face: fake landmark sets -> real contour rasterization
        n_faces = int(rng.integers(0, 3))
        landmarks = (rng.random((n_faces, 68, 2))
                     * np.array([w - 2, h - 2]) + 1)
        seg_face = faces_to_mask((h, w), landmarks) if n_faces else np.zeros(
            (h, w), np.uint8)
        boxes = (masks_to_boxes(
            np.stack([faces_to_mask((h, w), lm[None]) for lm in landmarks]))
            if n_faces else np.zeros((0, 4), np.float32))
        return {"seg_face": seg_face, "box_face": boxes}


class TorchScriptAnnotator:
    """Adapter for a user-supplied ``torch.jit`` model emitting the npz
    schema; loaded lazily inside the worker process."""

    def __init__(self, kind: str, path: str):
        self.kind = kind
        self.path = path
        self._model = None

    def __call__(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        import torch

        if self._model is None:
            self._model = torch.jit.load(self.path, map_location="cpu")
        with torch.no_grad():
            out = self._model(
                torch.from_numpy(image).permute(2, 0, 1)[None].float())
        return {k: v.numpy() for k, v in out.items()}


# ---------------------------------------------------------------------------
# local mode
# ---------------------------------------------------------------------------

def preprocess_local(image_paths: Sequence[str], out_dir: str,
                     annotators: Dict[str, Annotator],
                     workers_per_annotator: int = 1) -> None:
    """One process per (annotator, worker); stride split over images."""
    os.makedirs(out_dir, exist_ok=True)
    procs = []
    for kind, ann in annotators.items():
        for w in range(workers_per_annotator):
            p = mp.Process(target=_local_worker,
                           args=(list(image_paths), out_dir, kind, ann, w,
                                 workers_per_annotator))
            p.start()
            procs.append(p)
    for p in procs:
        p.join()
        if p.exitcode != 0:
            raise RuntimeError(f"annotator worker failed: {p.exitcode}")


def _local_worker(paths: List[str], out_dir: str, kind: str, ann: Annotator,
                  worker: int, total: int) -> None:
    from .dataset import decode_jpg

    for i, path in enumerate(paths):
        if i % total != worker:
            continue
        name = os.path.splitext(os.path.basename(path))[0]
        dst = os.path.join(out_dir, f"{name}_{kind}.npz")
        if os.path.exists(dst):
            continue
        with open(path, "rb") as f:
            img = decode_jpg(f.read())
        np.savez(dst, **ann(img))


# ---------------------------------------------------------------------------
# web (tar shard) mode
# ---------------------------------------------------------------------------

def preprocess_web(shards, out_dir: str, annotators: Dict[str, Annotator],
                   machine_idx: int = 0, machines_total: int = 1,
                   max_repack: int = 4, max_ahead: int = 4,
                   out_url: Optional[str] = None) -> List[str]:
    """Annotate every sample of every shard, then repack processed shards.

    Returns the list of written output tar paths.  The coordinator consumes
    ``{kind}/{worker}/{done}/{tar}`` messages and repacks once all
    annotator kinds report a tar complete (reference ready-queue protocol,
    ``preprocessor_web.py:157-232``).  ``max_ahead`` bounds how many shards
    a fast annotator may run ahead of the slowest one — the reference's
    disk-pressure throttle (``preprocessor_web.py:64,130-134,186-194``);
    scratch npz files for unrepacked shards are what the bound caps.

    ``out_url``: optional remote sink template containing ``{name}`` (the
    shard basename), e.g. ``pipe:aws s3 cp - s3://bucket/{name}`` — the
    reference's fsspec S3 write (``preprocessor_web.py:240-243``) as a
    symmetric ``pipe:`` URL.  When unset, tars land in ``out_dir``.
    """
    os.makedirs(out_dir, exist_ok=True)
    scratch = os.path.join(out_dir, "_scratch")
    os.makedirs(scratch, exist_ok=True)
    shards = [s for i, s in enumerate(expand_shards(shards))
              if i % machines_total == machine_idx]

    ready: mp.Queue = mp.Queue()
    # per-kind completed-shard counters, shared for the run-ahead throttle
    done_counters = mp.Array("i", len(annotators))
    procs = []
    for idx, (kind, ann) in enumerate(annotators.items()):
        p = mp.Process(target=_web_worker,
                       args=(shards, scratch, kind, ann, ready,
                             done_counters, idx, max_ahead))
        p.start()
        procs.append(p)

    # coordinator: count per-tar completions, repack when all kinds done
    done_counts: Dict[str, int] = {}
    state: Dict[str, str] = {}
    outputs: List[str] = []
    n_kinds = len(annotators)
    finished_workers = 0
    repack_procs: List[mp.Process] = []
    all_repack: List[Tuple[mp.Process, str]] = []  # for exit accounting
    def handle(msg: str) -> None:
        nonlocal finished_workers, repack_procs
        kind, worker, event, tar = msg.split("/", 3)
        if event == "exit":
            finished_workers += 1
            return
        if event != "done":
            state[tar] = f"{kind}:{event}"
            return
        done_counts[tar] = done_counts.get(tar, 0) + 1
        if done_counts[tar] == n_kinds:
            name = os.path.basename(tar)
            out_tar = (out_url.format(name=name) if out_url
                       else os.path.join(out_dir, name))
            repack_procs = [p for p in repack_procs if p.is_alive()]
            while len(repack_procs) >= max_repack:
                time.sleep(0.05)
                repack_procs = [p for p in repack_procs if p.is_alive()]
            p = mp.Process(target=repack_single_tar,
                           args=(tar, scratch, out_tar,
                                 tuple(annotators)))
            p.start()
            repack_procs.append(p)
            all_repack.append((p, out_tar))
            outputs.append(out_tar)
            _write_state(out_dir, done_counts, state)

    while finished_workers < n_kinds:
        try:
            msg = ready.get(timeout=5.0)
        except Exception:                              # queue.Empty
            # Liveness check: a worker that died without its exit sentinel
            # (e.g. SIGKILL) would otherwise block this loop forever.
            dead = [p for p in procs if not p.is_alive()
                    and p.exitcode not in (0, None)]
            if dead:
                for p in procs + repack_procs:
                    p.terminate()
                raise RuntimeError(
                    f"annotator worker(s) died: "
                    f"{[p.exitcode for p in dead]}") from None
            if all(not p.is_alive() for p in procs):
                # all exited cleanly — but final done/exit messages may
                # still be in flight through the queue feeder threads:
                # drain before breaking or the last shard never repacks
                while True:
                    try:
                        handle(ready.get(timeout=0.5))
                    except Exception:                  # queue.Empty
                        break
                break
            continue
        handle(msg)
    for p in procs + repack_procs:
        p.join()
    # Surface repack-child failures: a failed ``pipe:`` sink (or any
    # exception inside repack_single_tar) exits nonzero in the child —
    # without this check the run would report the shard as written while
    # it silently never reached the sink.
    failed = [(out, p.exitcode) for p, out in all_repack
              if p.exitcode not in (0, None)]
    if failed:
        raise RuntimeError(f"repack process(es) failed: {failed}")
    return outputs


def _scratch_name(shard: str, key: str, kind: str) -> str:
    """Scratch npz name, namespaced by shard so identical sample keys in
    different shards never collide (see repack_single_tar)."""
    base = os.path.splitext(os.path.basename(shard))[0]
    return f"{base}__{key}_{kind}.npz"


def _web_worker(shards: List[str], scratch: str, kind: str, ann: Annotator,
                ready: mp.Queue, done_counters, idx: int,
                max_ahead: int) -> None:
    from .dataset import decode_jpg

    try:
        for shard in shards:
            # run-ahead throttle: wait until the slowest annotator is within
            # max_ahead shards (reference preprocessor_web.py:186-194)
            while True:
                with done_counters.get_lock():
                    lag = done_counters[idx] - min(done_counters)
                if lag < max_ahead:
                    break
                time.sleep(0.05)
            ready.put(f"{kind}/0/started/{shard}")
            for sample in iter_tar_samples(shard):
                if "jpg" not in sample:
                    continue
                img = decode_jpg(sample["jpg"])  # type: ignore[arg-type]
                key = sample["__key__"]
                np.savez(os.path.join(
                    scratch, _scratch_name(shard, key, kind)), **ann(img))
            with done_counters.get_lock():
                done_counters[idx] += 1
            ready.put(f"{kind}/0/done/{shard}")
    finally:
        # Always enqueue the exit sentinel, even on worker exceptions, so
        # the coordinator never blocks forever on ready.get().
        ready.put(f"{kind}/0/exit/-")


def _open_tar_sink(out_tar: str):
    """Writable tar for a local path OR a ``pipe:<cmd>`` URL — symmetric
    with the read side (``tario._open_shard``) and the reference's remote
    repack sink, which streams the output tar to S3 through fsspec
    (``/root/reference/Data/preprocessor_web.py:240-243``).  For pipes the
    tar is written in stream mode to the subprocess's stdin (e.g.
    ``pipe:aws s3 cp - s3://bucket/shard.tar``)."""
    import subprocess

    if out_tar.startswith("pipe:"):
        proc = subprocess.Popen(out_tar[5:], shell=True,
                                stdin=subprocess.PIPE, bufsize=1 << 20)
        assert proc.stdin is not None
        return tarfile.open(fileobj=proc.stdin, mode="w|"), proc
    return tarfile.open(out_tar, "w"), None


def repack_single_tar(src_tar: str, scratch: str, out_tar: str,
                      kinds: Sequence[str]) -> None:
    """Merge source jpg/txt members + the per-kind npz outputs into one
    processed tar with a single combined npz per sample (the layout
    ``PreprocessedWebDataset`` consumes).  ``out_tar`` may be a local path
    or a ``pipe:<cmd>`` URL (see ``_open_tar_sink``)."""
    out, proc = _open_tar_sink(out_tar)
    try:
        try:
            _repack_into(out, src_tar, scratch, kinds)
            out.close()
        except BrokenPipeError:
            pass        # sink command died; surfaced via returncode below
    finally:
        if proc is not None:
            try:
                proc.stdin.close()
            except BrokenPipeError:
                pass
            rc = proc.wait()
            if rc != 0:
                raise RuntimeError(
                    f"repack sink command failed (rc={rc}): {out_tar}")


def _repack_into(out: tarfile.TarFile, src_tar: str, scratch: str,
                 kinds: Sequence[str]) -> None:
    for sample in iter_tar_samples(src_tar):
        key = sample["__key__"]
        merged: Dict[str, np.ndarray] = {}
        ok = True
        for kind in kinds:
            path = os.path.join(scratch,
                                _scratch_name(src_tar, key, kind))
            if not os.path.exists(path):
                ok = False
                break
            with np.load(path) as z:
                for name in z.files:
                    new = _RENAME.get((kind, name), name)
                    merged[new] = z[name]
        if not ok:
            continue
        for ext in ("jpg", "txt"):
            if ext in sample:
                _add_member(out, f"{key}.{ext}", sample[ext])
        buf = io.BytesIO()
        np.savez(buf, **merged)
        _add_member(out, f"{key}.npz", buf.getvalue())


# annotator-local npz names -> combined-tar names
# (reference per-annotator files use "edges"; the combined tar uses
#  edge_panoptic / edge_human — dataset_preprocessor_web.py:100-110)
_RENAME = {
    ("panoptic", "edges"): "edge_panoptic",
    ("human", "edges"): "edge_human",
}


def _add_member(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


def _write_state(out_dir: str, done_counts: Dict[str, int],
                 state: Dict[str, str]) -> None:
    """Progress JSON (reference info.state, preprocessor_web.py:222-226)."""
    with open(os.path.join(out_dir, "info.state"), "w") as f:
        json.dump({"done": done_counts, "state": state}, f)


def run_preprocessor(cfg: Dict) -> List[str]:
    """CLI glue: build annotators from config and dispatch local/web mode."""
    anns: Dict[str, Annotator] = {}
    for kind in ANNOTATOR_KINDS:
        spec = cfg.get("annotators", {}).get(kind, {"type": "synthetic"})
        if spec.get("type") == "torchscript":
            anns[kind] = TorchScriptAnnotator(kind, spec["path"])
        else:
            anns[kind] = SyntheticAnnotator(kind, seed=spec.get("seed", 0))
    if cfg.get("mode", "web") == "local":
        preprocess_local(cfg["images"], cfg["out_dir"], anns,
                         cfg.get("workers_per_annotator", 1))
        return []
    return preprocess_web(cfg["shards"], cfg["out_dir"], anns,
                          machine_idx=cfg.get("machine_idx", 0),
                          machines_total=cfg.get("machines_total", 1),
                          out_url=cfg.get("out_url"))
