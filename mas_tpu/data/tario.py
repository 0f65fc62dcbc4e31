"""Streaming WebDataset-style tar shard reader, dependency-free.

Replaces the reference's ``webdataset`` + ``pipe:aws s3 cp`` stack
(``/root/reference/Data/dataset_preprocessor_web.py:145-166``) with a small
host-side reader:

  * samples are tar members grouped by key (path up to the first dot),
    extensions become dict fields — the WebDataset on-disk convention,
  * shard sources: local paths, directories, or ``pipe:<command>`` URLs
    (the subprocess's stdout is streamed, exactly the reference's S3 trick),
  * ``shard_split`` deals shards across (process, data-worker) the way the
    reference splits by RANK/WORLD_SIZE (``dataset_preprocessor_web.py:
    23-30``) — here keyed by ``jax.process_index()`` at the call site,
  * ``warn_and_continue`` error policy per sample (``dataset_preprocessor_
    web.py:139-143``).

This is deliberately host-side Python: tar decode + jpeg decode are I/O
bound and overlap TPU step time through the prefetching iterator in
``dataset.py``.
"""

from __future__ import annotations

import io
import subprocess
import sys
import tarfile
import warnings
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence


def warn_and_continue(exn: BaseException) -> bool:
    """Sample-level error policy: log and skip (reference semantics)."""
    warnings.warn(f"skipping sample after error: {exn!r}")
    return True


def _open_shard(url: str):
    """Local path or ``pipe:<cmd>`` -> (binary stream, subprocess or None).

    The subprocess is returned so the consumer can reap it after the
    stream is drained/closed — otherwise every pipe shard leaves a
    zombie for the life of a long preprocessing run."""
    if url.startswith("pipe:"):
        proc = subprocess.Popen(url[5:], shell=True, stdout=subprocess.PIPE,
                                bufsize=1 << 20)
        assert proc.stdout is not None
        return proc.stdout, proc
    return open(url, "rb"), None


def iter_tar_samples(url: str,
                     handler: Callable[[BaseException], bool] = warn_and_continue
                     ) -> Iterator[Dict[str, bytes]]:
    """Stream one tar shard -> dicts of {extension: bytes, '__key__': str,
    '__url__': str}.  Members sharing the same key (basename before the
    first dot) form one sample; tar ordering groups them (WebDataset
    convention)."""
    stream, proc = _open_shard(url)
    try:
        tf = tarfile.open(fileobj=stream, mode="r|*")
        current_key: Optional[str] = None
        sample: Dict[str, object] = {}
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            if "/" in name:
                name = name.rsplit("/", 1)[1]
            if "." not in name:
                key, ext = name, ""
            else:
                key, ext = name.split(".", 1)
            try:
                data = tf.extractfile(member).read()  # type: ignore[union-attr]
            except Exception as exn:                  # noqa: BLE001
                if handler(exn):
                    continue
                raise
            if key != current_key:
                if current_key is not None and sample:
                    yield sample  # type: ignore[misc]
                current_key = key
                sample = {"__key__": key, "__url__": url}
            sample[ext] = data
        if current_key is not None and sample:
            yield sample  # type: ignore[misc]
    except Exception as exn:                          # noqa: BLE001
        if not handler(exn):
            raise
    finally:
        stream.close()
        if proc is not None:
            # Normal path: the command already exited at EOF — reap it.
            # Early generator close: stdout is gone (SIGPIPE), but a
            # command that ignores it would block wait() — terminate.
            if proc.poll() is None:
                proc.terminate()
            proc.wait()


def shard_split(shards: Sequence[str], index: int, count: int,
                worker: int = 0, num_workers: int = 1) -> List[str]:
    """Deterministic interleaved shard assignment for (process, worker).

    Equivalent coverage to the reference's two-phase node splitter
    (``my_split_by_node``) + per-worker split: every shard goes to exactly
    one (process, worker) pair, round-robin for balance.
    """
    total = max(count, 1) * max(num_workers, 1)
    slot = index * max(num_workers, 1) + worker
    return [s for i, s in enumerate(shards) if i % total == slot]


def expand_shards(root_or_urls) -> List[str]:
    """Directory -> sorted member .tar paths; str/list passthrough."""
    import os

    if isinstance(root_or_urls, str):
        if os.path.isdir(root_or_urls):
            return sorted(
                os.path.join(root_or_urls, f)
                for f in os.listdir(root_or_urls) if f.endswith(".tar"))
        return [root_or_urls]
    return list(root_or_urls)
