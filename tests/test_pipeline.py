"""Host data-pipeline unit tests: batch fast-forward (mid-epoch resume),
prefetcher lifecycle on abandoned iteration, and loader-thread-order-independent
augmentation RNG (ADVICE r2)."""

import threading
import time

import numpy as np
import pytest

from cxrmate_tpu.data.pipeline import Prefetcher, batch_iterator


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"images": np.full((1, 2, 2), i, np.float32), "idx": i}


def _ids(batches):
    return [b["idx"] for b in batches]


def test_batch_iterator_skip_batches_matches_tail():
    ds = _ArrayDataset(13)
    full = _ids(batch_iterator(ds, 3, shuffle=True, seed=7, drop_last=True))
    skipped = _ids(batch_iterator(ds, 3, shuffle=True, seed=7, drop_last=True, skip_batches=2))
    assert skipped == full[2:]
    # per-rank semantics: skip applies after rank striding
    r1_full = _ids(batch_iterator(ds, 2, rank=1, world_size=2))
    r1_skip = _ids(batch_iterator(ds, 2, rank=1, world_size=2, skip_batches=1))
    assert r1_skip == r1_full[1:]


def test_prefetcher_close_on_abandoned_iteration():
    """A consumer that breaks early (fast_dev_run) must not leave the producer
    blocked in queue.put holding the loader pool (ADVICE r2: leaked daemon
    thread + ThreadPoolExecutor per epoch)."""
    closed = threading.Event()

    def gen():
        try:
            for i in range(100):
                yield i
        finally:
            closed.set()

    pf = Prefetcher(gen(), depth=2)
    for item in pf:
        break  # abandon immediately
    pf.close()
    deadline = time.time() + 5
    while pf.thread.is_alive() and time.time() < deadline:
        time.sleep(0.01)
    assert not pf.thread.is_alive(), "producer thread still blocked after close()"
    assert closed.wait(1), "inner generator finally (pool shutdown) never ran"


def test_prefetcher_still_propagates_worker_errors():
    def gen():
        yield 1
        raise RuntimeError("loader died")

    pf = Prefetcher(gen())
    with pytest.raises(RuntimeError, match="loader died"):
        list(pf)


def test_train_transform_rng_independent_of_thread_schedule(tmp_path):
    """Augmentation draws are keyed by (seed, epoch, path): concurrent decoding
    in any completion order yields identical outputs, and epochs differ."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from cxrmate_tpu.data.image import make_train_loader_transform

    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 36), np.uint8), "L").save(p)
        paths.append(str(p))

    load = make_train_loader_transform(size=32, seed=3)
    serial = [load(p) for p in paths]
    # reversed order (simulating adversarial pool scheduling)
    reordered = [load(p) for p in reversed(paths)][::-1]
    for a, b in zip(serial, reordered):
        np.testing.assert_array_equal(a, b)
    # and genuinely concurrent
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(4) as pool:
        concurrent = list(pool.map(load, paths))
    for a, b in zip(serial, concurrent):
        np.testing.assert_array_equal(a, b)
    # different epoch → different draws (augmentation must vary across epochs)
    load.set_epoch(1)
    epoch1 = [load(p) for p in paths]
    assert any(not np.array_equal(a, b) for a, b in zip(serial, epoch1))


def test_prefetcher_slow_consumer_receives_every_batch():
    """The end-of-iterator sentinel must never displace a queued real batch:
    with a consumer slower than the producer (queue full when the iterator
    finishes), every produced batch still arrives, in order."""
    import time

    from cxrmate_tpu.data.pipeline import Prefetcher

    n = 12  # > queue depth (5) so the queue is saturated at producer finish
    pf = Prefetcher(iter(range(n)))
    time.sleep(0.3)  # let the producer fill the queue and hit the sentinel path
    got = []
    for item in pf:
        time.sleep(0.02)  # slow consumer
        got.append(item)
    assert got == list(range(n))
