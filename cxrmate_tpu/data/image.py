"""Image loading + preprocessing.

The reference's transforms (`/root/reference/modules/lightning_modules/single.py:230-262`)
operate on PIL images: Resize(shortest_edge=384, bilinear) → Center/RandomCrop(384,
pad_if_needed) → [RandomRotation(±5°)] → ToTensor → Normalize(ImageNet mean/std).
The host path here uses PIL for the resample-exactness the output-parity target
requires; the device path does the crop/normalize math on-TPU from uint8 arrays
(fused by XLA into the encoder's first conv) and uses ``jax.image.resize`` — fast
but not bit-identical to PIL, so it is opt-in."""

from __future__ import annotations

import hashlib
import os
import random
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image(path: str, colour_space: str = "RGB"):
    img = Image.open(path)
    return img.convert(colour_space)


def resize_shortest_edge(img, size: int):
    """torchvision Resize(int) semantics: shortest edge → size, long edge scaled
    with int TRUNCATION (torchvision _compute_resized_output_size), PIL bilinear."""
    w, h = img.size
    if w <= h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    if (nw, nh) == (w, h):
        return img
    return img.resize((nw, nh), Image.BILINEAR)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    if h < size or w < size:  # pad_if_needed semantics
        pad_h, pad_w = max(size - h, 0), max(size - w, 0)
        arr = np.pad(arr, ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        h, w = arr.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return arr[top : top + size, left : left + size]


def random_crop(arr: np.ndarray, size: int, rng: random.Random) -> np.ndarray:
    arr = pad_if_needed(arr, size)
    h, w = arr.shape[:2]
    top = rng.randint(0, h - size)
    left = rng.randint(0, w - size)
    return arr[top : top + size, left : left + size]


def pad_if_needed(arr: np.ndarray, size: int) -> np.ndarray:
    """torchvision RandomCrop(pad_if_needed=True) semantics: pads (size − dim) on
    BOTH sides of a short dimension (transforms.RandomCrop.forward), unlike
    CenterCrop's split-half padding."""
    h, w = arr.shape[:2]
    pad_h, pad_w = max(size - h, 0), max(size - w, 0)
    if pad_h or pad_w:
        arr = np.pad(arr, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    return arr


def normalize_chw(arr_hwc_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC → normalized float32 CHW (ToTensor + Normalize)."""
    x = arr_hwc_u8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(x, (2, 0, 1))


def eval_transform_u8(img, size: int = 384) -> np.ndarray:
    """The deterministic uint8 prefix of ``eval_transform`` (resize → gray→RGB
    stack → center crop) — the part the decoded-image cache stores."""
    img = resize_shortest_edge(img, size)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return center_crop(arr, size)


def eval_transform(img, size: int = 384) -> np.ndarray:
    return normalize_chw(eval_transform_u8(img, size))


def train_transform(img, size: int = 384, rng: Optional[random.Random] = None,
                    rotation_degrees: float = 5.0,
                    crop_ij: Optional[Tuple[int, int]] = None,
                    angle: Optional[float] = None) -> np.ndarray:
    """The reference train pipeline IN ORDER (single.py:230-241): Resize(shortest
    edge) → RandomCrop(384, pad_if_needed) → RandomRotation(±5°, NEAREST, expand
    False, fill 0) → ToTensor → Normalize. ``crop_ij``/``angle`` inject the random
    parameters (used by the torchvision parity test); by default they are drawn
    from ``rng`` in the same order torchvision draws them (crop i, j, then angle)."""
    img = resize_shortest_edge(img, size)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return train_augment(np.asarray(img), size, rng, rotation_degrees, crop_ij, angle)


def train_augment(arr: np.ndarray, size: int, rng: Optional[random.Random] = None,
                  rotation_degrees: float = 5.0,
                  crop_ij: Optional[Tuple[int, int]] = None,
                  angle: Optional[float] = None) -> np.ndarray:
    """The augmentation tail of ``train_transform``, taking the already
    resized RGB uint8 HWC array (what the decoded-image cache stores)."""
    rng = rng or random.Random()
    arr = pad_if_needed(arr, size)
    h, w = arr.shape[:2]
    if crop_ij is None:
        crop_ij = (rng.randint(0, h - size), rng.randint(0, w - size))
    top, left = crop_ij
    arr = arr[top : top + size, left : left + size]
    if angle is None:
        angle = rng.uniform(-rotation_degrees, rotation_degrees)
    # torchvision F.rotate: counter-clockwise for positive angles, same as
    # PIL.Image.rotate; NEAREST resample, no expand, zero fill
    img = Image.fromarray(arr).rotate(angle, resample=Image.NEAREST, expand=False, fillcolor=0)
    return normalize_chw(np.asarray(img))


# ----------------------------------------------------------- decoded-image cache
# JPEG entropy (Huffman) decode is the loaders' irreducible per-image cost on
# the host — ~30-45 ms/image for ~2 MB MIMIC-sized sources on one core at any
# DCT scale (DEVNOTES "input pipeline", round 4) — while np.load of the decoded
# uint8 intermediate is ~0.1 ms. Every loader path re-reads the same images
# each epoch/run (the reference re-decodes with PIL every epoch,
# /root/reference/data/dicom_id.py:78-95), so an opt-in on-disk cache of each
# transform's own DETERMINISTIC uint8 prefix (resize for train, resize+crop for
# eval) makes warm epochs host-feasible even on a single core. The cache stores
# the exact intermediate the transform itself computed, so cached and uncached
# outputs are byte-identical per path (the PIL-exact eval path stays
# PIL-exact). Keyed by absolute path + source (mtime_ns, size) + target size +
# variant, so source changes invalidate automatically; writes are
# tmp+rename-atomic for concurrent loader pools. ~150-180 KB/image (u8, gray
# sources stay single-channel) vs ~1.5 MB source JPEGs.


def _cache_file(cache_dir: str, path: str, size: int, variant: str) -> str:
    st = os.stat(path)
    key = hashlib.sha1(
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}|{size}|{variant}".encode()
    ).hexdigest()
    return os.path.join(cache_dir, key[:2], key + ".npy")


def _cache_get(cache_file: str) -> Optional[np.ndarray]:
    try:
        return np.load(cache_file)
    except Exception:  # noqa: BLE001 - miss/corrupt/partial → recompute
        return None


def _cache_put(cache_file: str, arr: np.ndarray) -> None:
    try:
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        tmp = f"{cache_file}.tmp.{os.getpid()}.{id(arr)}"
        with open(tmp, "wb") as f:  # np.save(str) would append its own .npy
            np.save(f, arr)
        os.replace(tmp, cache_file)
    except OSError:  # cache dir unwritable/full: keep serving uncached
        pass


class CacheWarmer:
    """Background decoded-image-cache warmer (VERDICT r4 item 3: warm input is
    the default story, not a manual script).

    Started at stage entry (cli/stages.py fit/fit_scst/test), it decodes the
    stage's image files into the cache on daemon threads WHILE the first XLA
    program compiles — the host is otherwise idle for minutes through the axon
    remote-compile tunnel, so by first-batch time most (often all) of the
    epoch's JPEG entropy decodes are already paid. Every entry is written with
    the loader's own tmp+rename-atomic ``_cache_put``, so racing the stage's
    own loader pool is safe (both compute the same deterministic bytes; one
    rename wins). A context manager: ``stop()``/``__exit__`` halts the threads
    so an aborted stage does not keep decoding in the background; threads also
    exit on their own when the work list is exhausted.

    ``jobs``: [(load_fn, paths), ...] — one entry per dataset split, warmed in
    order (train first: it is consumed first). A loader exposing a ``warm``
    attribute (the cached factories above) is warmed through that decode-only
    entry point instead of the full closure — no discarded augment/normalize
    tail, and already-cached entries cost one stat() instead of a full np.load.
    ``scripts/warm_cache.py`` remains for explicit ahead-of-time warming
    (e.g. on a shared cache host)."""

    def __init__(self, jobs, workers: Optional[int] = None):
        import itertools
        import threading

        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._work = itertools.chain.from_iterable(
            ((getattr(load, "warm", load), p) for p in paths) for load, paths in jobs
        )
        n = workers or min(8, os.cpu_count() or 1)
        self.threads = [
            threading.Thread(target=self._run, daemon=True, name=f"cache-warmer-{i}")
            for i in range(n)
        ]
        for t in self.threads:
            t.start()

    def _run(self):
        while not self._stop.is_set():
            with self._lock:
                item = next(self._work, None)
            if item is None:
                return
            load, path = item
            try:
                load(path)
            except Exception:  # noqa: BLE001 - corrupt file: the stage's own
                pass           # loader will surface the real error with context

    def stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        for t in self.threads:
            t.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False


def make_eval_loader_transform(size: int = 384, cache_dir: Optional[str] = None):
    """PIL-exact eval loader: output parity with the reference requires
    bit-identical decode + resize (single.py:248-262). ``cache_dir`` caches the
    cropped uint8 intermediate (the exact pipeline's own output, so cached runs
    stay bit-identical) — see the decoded-image cache note above."""

    def decode_for_cache(path: str) -> np.ndarray:
        a = np.asarray(resize_shortest_edge(load_image(path), size))
        # replicated-gray sources (all MIMIC JPEGs; load_image's
        # convert("RGB") replicates the single channel, and PIL resizes
        # channels independently so they stay replicated) store ONE channel
        # — 3× less cache disk/read traffic. stack-then-crop equals
        # crop-then-stack, so this stays byte-identical to eval_transform.
        if (a[:, :, 0] == a[:, :, 1]).all() and (a[:, :, 0] == a[:, :, 2]).all():
            return center_crop(a[:, :, :1], size)[:, :, 0]
        return center_crop(a, size)

    def load(path: str) -> np.ndarray:
        if cache_dir is None:
            return eval_transform(load_image(path), size)
        cf = _cache_file(cache_dir, path, size, "eval")
        arr = _cache_get(cf)
        if arr is None:
            arr = decode_for_cache(path)
            _cache_put(cf, arr)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return normalize_chw(arr)

    if cache_dir is not None:
        load.warm = _make_warm(cache_dir, size, "eval", decode_for_cache)
    return load


def _make_warm(cache_dir: str, size: int, variant: str, decode_for_cache):
    """Decode-only cache-fill entry point (``load.warm``) the CacheWarmer
    prefers over the full loader closure: skips the normalize/augment tail the
    warmer would throw away, and skips the decode entirely when the entry
    already exists (a completed ``_cache_put`` rename implies a whole file)."""

    def warm(path: str) -> None:
        cf = _cache_file(cache_dir, path, size, variant)
        if not os.path.exists(cf):
            _cache_put(cf, decode_for_cache(path))

    return warm


def make_fast_eval_loader_transform(size: int = 384, normalize: bool = False,
                                    cache_dir: Optional[str] = None):
    """Throughput-serving loader — NOT PIL-bit-exact (the golden-CSV parity path
    keeps ``make_eval_loader_transform``): one fused native call does the
    DCT-scaled grayscale decode + bilinear resize (data/native
    ``jpeg_decode_resized``), then a uint8 center crop. By default returns the
    cropped GRAY uint8 [size, size] — the device broadcasts to 3 channels and
    normalizes (``device_normalize_gray_u8``), which is 12× less host→device
    bytes than normalized float32 CHW and lets XLA fuse the arithmetic into the
    encoder's first conv. ``normalize=True`` instead returns float32 [3, size,
    size] like the exact loader (CPU fallback paths). Falls back to the PIL
    pipeline (grayscale) when the native decode is unavailable."""

    def decode(path: str) -> np.ndarray:
        from cxrmate_tpu.data import native as native_mod

        arr = native_mod.load_jpeg_resized(path, size, gray=True, fast_dct=True)
        if arr is None:  # PIL fallback (non-JPEG, colour source, no toolchain)
            img = resize_shortest_edge(load_image(path, "L"), size)
            arr = np.asarray(img)
        if arr.ndim == 3:  # colour source fell through the RGB path
            # ITU-R 601 luma like PIL convert("L")
            arr = (arr @ np.array([0.299, 0.587, 0.114], np.float32)).astype(np.uint8)
        return center_crop(arr[:, :, None], size)[:, :, 0]

    # the cache key carries the decode backend: the fused native decode is NOT
    # byte-identical to its PIL fallback, so entries written by one backend
    # must never be served to the other (e.g. a cache warmed on a host with the
    # toolchain, then read on one without)
    variant = None
    if cache_dir is not None:
        from cxrmate_tpu.data import native as native_mod

        variant = "fast-native" if native_mod.available() else "fast-pil"

    def load(path: str):
        if cache_dir is None:
            arr = decode(path)
        else:
            cf = _cache_file(cache_dir, path, size, variant)
            arr = _cache_get(cf)
            if arr is None:
                arr = decode(path)
                _cache_put(cf, arr)
        if not normalize:
            return arr
        x = np.repeat(arr[None, :, :], 3, axis=0).astype(np.float32) / 255.0
        return (x - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]

    if cache_dir is not None:
        load.warm = _make_warm(cache_dir, size, variant, decode)
    return load


def make_train_loader_transform(size: int = 384, seed: int = 0, native_decode: bool = True,
                                cache_dir: Optional[str] = None):
    """Training loader: native libjpeg decode at a DCT-domain scale chosen so the
    shortest edge stays ≥ ``size`` (data/native/ — byte-identical to PIL at full
    scale, low-passed-but-bounded at 1/2..1/8, tolerance-tested), falling back to
    PIL whenever the native path is unavailable or fails.

    Augmentation draws come from a per-call RNG seeded by (seed, epoch, path) —
    deterministic regardless of loader-thread scheduling (a single shared RNG
    would assign draws in pool-completion order), and varying across epochs like
    torch DataLoader worker seeds. The trainer advances the epoch via
    ``load.set_epoch(e)``."""
    import zlib

    state = {"epoch": 0}
    # like the fast loader: the native DCT-scaled decode (denom > 1) is
    # low-passed vs PIL's full decode, so the cache key carries the effective
    # backend — entries from one backend are never served to the other
    variant = None
    if cache_dir is not None:
        from cxrmate_tpu.data import native as native_mod

        use_native = native_decode and native_mod.available()
        variant = "train-native" if use_native else "train-pil"

    def decode_resized_rgb(path: str) -> np.ndarray:
        img = None
        if native_decode:
            from cxrmate_tpu.data import native as native_mod

            arr = native_mod.load_jpeg_scaled(path, size)
            if arr is not None:
                img = Image.fromarray(arr)
        if img is None:
            img = load_image(path)
        img = resize_shortest_edge(img, size)
        if img.mode != "RGB":
            img = img.convert("RGB")
        return np.asarray(img)

    def load(path: str) -> np.ndarray:
        rng = random.Random(
            (seed * 1_000_003 + state["epoch"]) * 4_294_967_291 + zlib.crc32(path.encode())
        )
        if cache_dir is None:
            return train_augment(decode_resized_rgb(path), size, rng)
        # cache key must NOT include the epoch: augmentation draws happen after
        # the cached deterministic prefix (resize), per-epoch like torchvision
        cf = _cache_file(cache_dir, path, size, variant)
        arr = _cache_get(cf)
        if arr is None:
            arr = decode_for_cache(path)
            _cache_put(cf, arr)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return train_augment(arr, size, rng)

    def decode_for_cache(path: str) -> np.ndarray:
        arr = decode_resized_rgb(path)
        # replicated-gray sources (all MIMIC JPEGs) store one channel (3x
        # less cache disk/read traffic); re-replicated on load
        if (arr[:, :, 0] == arr[:, :, 1]).all() and (arr[:, :, 0] == arr[:, :, 2]).all():
            return arr[:, :, 0]
        return arr

    load.set_epoch = lambda e: state.__setitem__("epoch", int(e))
    if cache_dir is not None:
        load.warm = _make_warm(cache_dir, size, variant, decode_for_cache)
    return load


# ------------------------------------------------------------- device-side path
def device_normalize_gray_u8(pixels_u8):
    """Device-side tail of the u8 serving loader
    (``make_fast_eval_loader_transform``): grayscale uint8 [..., H, W] →
    ImageNet-normalized bfloat16 [..., 3, H, W] (gray→RGB replication like PIL
    convert("RGB")). Shipping uint8 gray and normalizing on-device is 12× less
    host→device traffic than normalized float32 RGB, and XLA fuses the
    arithmetic into the encoder's first conv. Call inside jit."""
    import jax.numpy as jnp

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)[:, None, None]
    std = jnp.asarray(IMAGENET_STD, jnp.float32)[:, None, None]
    x = pixels_u8[..., None, :, :].astype(jnp.float32) / 255.0
    return ((x - mean) / std).astype(jnp.bfloat16)  # mean [3,1,1] broadcasts to 3ch


def device_preprocess(batch_u8, size: int = 384):
    """[B, H, W, 3] uint8 on device → [B, 3, size, size] normalized float32.

    Resize + crop + normalize in one jitted call; XLA fuses the arithmetic into the
    first conv. Approximate (not PIL-bit-exact) — use for training/throughput."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(x):
        b, h, w, c = x.shape
        scale = size / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        y = jax.image.resize(x.astype(jnp.float32), (b, nh, nw, c), method="bilinear", antialias=True)
        top, left = (nh - size) // 2, (nw - size) // 2
        y = jax.lax.dynamic_slice(y, (0, top, left, 0), (b, size, size, c))
        y = y / 255.0
        y = (y - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return jnp.transpose(y, (0, 3, 1, 2))

    return fn(batch_u8)
