"""Train/eval image-transform parity vs the reference torchvision pipeline
(`/root/reference/modules/lightning_modules/single.py:229-262`).

torchvision itself is not installed in this image, but its PIL backend delegates
the heavy primitives to PIL (F_pil.resize → Image.resize(BILINEAR); F_pil.rotate
→ Image.transform with the same inverse-affine matrix Image.rotate builds), so
the oracle here is an independent in-test transcription of the reference's
transform COMPOSITION with torchvision's documented parameter semantics:

  * Resize(int): shortest edge → size, other edge scaled with int truncation
    (torchvision _compute_resized_output_size).
  * RandomCrop(size, pad_if_needed=True): pads (size − dim) on BOTH sides of a
    short dimension (transforms.RandomCrop.forward), then crops at (i, j) drawn
    uniformly over the padded extent.
  * RandomRotation(5): angle ~ U(−5, 5), counter-clockwise for positive angles,
    InterpolationMode.NEAREST, expand=False, fill=0.
  * ToTensor + Normalize(ImageNet mean/std).
"""

import glob
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from cxrmate_tpu.data import image as image_mod


def _reference_composition(img, size, top, left, angle):
    """The reference train pipeline, transcribed step by step."""
    # Resize(shortest_edge)
    w, h = img.size
    if w <= h:
        nw, nh = size, int(size * h / w)
    else:
        nw, nh = int(size * w / h), size
    if (nw, nh) != (w, h):
        img = img.resize((nw, nh), Image.BILINEAR)
    img = img.convert("RGB")
    # RandomCrop(pad_if_needed=True): both-sides padding per short dimension
    arr = np.asarray(img)
    hh, ww = arr.shape[:2]
    pad_h, pad_w = max(size - hh, 0), max(size - ww, 0)
    if pad_h or pad_w:
        arr = np.pad(arr, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    arr = arr[top : top + size, left : left + size]
    # RandomRotation: torchvision F_pil.rotate == PIL Image.rotate (ccw positive,
    # NEAREST, no expand, zero fill)
    out = Image.fromarray(arr).rotate(angle, resample=Image.NEAREST, expand=False, fillcolor=0)
    # ToTensor + Normalize
    x = np.asarray(out).astype(np.float32) / 255.0
    x = (x - image_mod.IMAGENET_MEAN) / image_mod.IMAGENET_STD
    return np.transpose(x, (2, 0, 1))


@pytest.mark.parametrize("hw", [(500, 400), (400, 500), (64, 48), (40, 700)])
@pytest.mark.parametrize("angle", [-4.2, 0.0, 3.7])
def test_train_transform_matches_reference_composition(hw, angle):
    rng = np.random.RandomState(hash(hw) % 2**31)
    img = Image.fromarray(rng.randint(0, 255, size=(*hw, 3), dtype=np.uint8), "RGB")
    size = 64
    # valid crop window inside the (possibly padded) resized image
    resized = image_mod.resize_shortest_edge(img, size)
    arr = image_mod.pad_if_needed(np.asarray(resized.convert("RGB")), size)
    h, w = arr.shape[:2]
    for top, left in [(0, 0), (h - size, w - size), ((h - size) // 2, (w - size) // 3 if w > size else 0)]:
        got = image_mod.train_transform(img, size=size, crop_ij=(top, left), angle=angle)
        want = _reference_composition(img, size, top, left, angle)
        np.testing.assert_array_equal(got, want)


def test_rotation_is_counter_clockwise_after_crop():
    """Order matters: rotation happens AFTER the crop (the reference composes
    RandomCrop before RandomRotation), and positive angles are counter-clockwise."""
    size = 64
    arr = np.zeros((size, size, 3), np.uint8)
    arr[:8, :, :] = 255  # bright top band
    img = Image.fromarray(arr, "RGB")
    got = image_mod.train_transform(img, size=size, crop_ij=(0, 0), angle=10.0)
    # counter-clockwise (as viewed, y down): the band's left end moves DOWN,
    # its right end moves UP/out of frame
    bright = got[0] > 1.0  # normalized 255 ≈ 2.25 on channel 0
    rows_left = np.where(bright[:, 5])[0]
    rows_right = np.where(bright[:, size - 6])[0]
    assert rows_left.min() > rows_right.min()
    assert rows_left.max() > rows_right.max()
    # zero fill is applied BEFORE normalization (fill=0 → −mean/std after ToTensor)
    fill_value = (0.0 - image_mod.IMAGENET_MEAN[0]) / image_mod.IMAGENET_STD[0]
    assert got[0, size - 1, size - 1] == pytest.approx(fill_value, rel=1e-6)


def test_pad_if_needed_pads_both_sides():
    """torchvision RandomCrop(pad_if_needed) pads (size − dim) on BOTH sides —
    a 1-pixel-wide image ends up 2·(size−1)+1 wide, not size wide."""
    arr = np.full((64, 1, 3), 200, np.uint8)
    padded = image_mod.pad_if_needed(arr, 64)
    assert padded.shape == (64, 2 * 63 + 1, 3)
    assert padded[:, 63].mean() == 200 and padded[:, 0].mean() == 0


def test_train_draw_order_matches_torchvision():
    """Random draws happen in torchvision order: crop i, then j, then angle."""
    import random

    img = Image.fromarray(np.zeros((100, 80, 3), np.uint8), "RGB")
    rng = random.Random(0)
    image_mod.train_transform(img, size=64, rng=rng)
    rng2 = random.Random(0)
    i = rng2.randint(0, 100 * 64 // 80 - 64)  # resized h=80→64 ⇒ h=int(64*100/80)=80
    j = rng2.randint(0, 0)
    angle = rng2.uniform(-5.0, 5.0)
    rng3 = random.Random(0)
    got = image_mod.train_transform(img, size=64, rng=rng3)
    want = image_mod.train_transform(img, size=64, crop_ij=(i, j), angle=angle)
    np.testing.assert_array_equal(got, want)


def _jpeg_bytes(arr, mode="RGB", quality=90):
    import io

    img = Image.fromarray(arr, mode)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _smooth_image(h, w):
    """Photo-like synthetic image (gradients + blobs) — DCT-scaled decode is a
    low-pass approximation, so tolerance is only meaningful on band-limited
    content, not white noise."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        127 + 80 * np.sin(x / 97.0) * np.cos(y / 71.0) + 40 * np.sin((x + y) / 211.0)
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_native_jpeg_decode_full_scale_matches_pil():
    native = pytest.importorskip("cxrmate_tpu.data.native")
    if not native.available():
        pytest.skip("native jpeg decoder unavailable (no gcc/libjpeg)")
    import io

    rng = np.random.RandomState(0)
    for mode, shape in (("RGB", (80, 100, 3)), ("L", (64, 96))):
        arr = rng.randint(0, 255, size=shape, dtype=np.uint8)
        data = _jpeg_bytes(arr, mode)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        nat = native.decode_jpeg(data, 1)
        # same libjpeg algorithm (JDCT_ISLOW) → byte identity at full scale
        np.testing.assert_array_equal(nat, pil)


def test_native_jpeg_scaled_decode_tolerance(tmp_path):
    """The DCT-scaled training decode is a documented approximation: resized
    output stays within a small mean-absolute error of the PIL-exact pipeline
    on band-limited content."""
    native = pytest.importorskip("cxrmate_tpu.data.native")
    if not native.available():
        pytest.skip("native jpeg decoder unavailable")
    size = 96
    arr = _smooth_image(768, 1024)  # denom 8 → 96-px shortest edge exactly
    path = tmp_path / "big.jpg"
    path.write_bytes(_jpeg_bytes(arr, "L"))

    scaled = native.load_jpeg_scaled(str(path), size)
    assert scaled is not None and min(scaled.shape[:2]) >= size
    a = image_mod.eval_transform(Image.fromarray(scaled), size)
    b = image_mod.eval_transform(image_mod.load_image(str(path)), size)
    mad = np.abs(a - b).mean()  # normalized units (std ≈ 0.225 per 57 u8 levels)
    assert mad < 0.05, mad


def test_fused_decode_resize_tolerance(tmp_path):
    """The fused native decode+resize (gray, IFAST DCT, bilinear) stays close
    to the PIL-exact resize on band-limited content, at the exact torchvision
    output shape (shortest edge → size, long edge int-truncated)."""
    native = pytest.importorskip("cxrmate_tpu.data.native")
    if not native.available():
        pytest.skip("native jpeg decoder unavailable")
    size = 96
    arr = _smooth_image(900, 1200)
    path = tmp_path / "big.jpg"
    path.write_bytes(_jpeg_bytes(arr, "L"))

    fused = native.load_jpeg_resized(str(path), size, gray=True, fast_dct=True)
    ref = np.asarray(
        image_mod.resize_shortest_edge(image_mod.load_image(str(path), "L"), size)
    )
    assert fused is not None and fused.shape == ref.shape, (fused.shape, ref.shape)
    mad = np.abs(fused.astype(np.int32) - ref.astype(np.int32)).mean()
    assert mad < 3.0, mad  # u8 levels

    # colour sources route through the RGB path and still hit the target shape
    rgb_arr = np.stack([arr, arr // 2, arr // 3], axis=-1)
    cpath = tmp_path / "rgb.jpg"
    cpath.write_bytes(_jpeg_bytes(rgb_arr, "RGB"))
    fused_rgb = native.load_jpeg_resized(str(cpath), size, gray=True)
    assert fused_rgb is not None and fused_rgb.shape == ref.shape + (3,)


def test_fast_eval_loader_transform(tmp_path):
    """The throughput loader returns a cropped gray uint8 square (or normalized
    float32 CHW), and falls back to PIL for non-JPEG inputs."""
    arr = _smooth_image(500, 700)
    jpath = tmp_path / "a.jpg"
    jpath.write_bytes(_jpeg_bytes(arr, "L"))

    load_u8 = image_mod.make_fast_eval_loader_transform(size=96)
    out = load_u8(str(jpath))
    assert out.shape == (96, 96) and out.dtype == np.uint8

    load_f = image_mod.make_fast_eval_loader_transform(size=96, normalize=True)
    outf = load_f(str(jpath))
    assert outf.shape == (3, 96, 96) and outf.dtype == np.float32
    # the normalized path is the same pixels through ToTensor+Normalize
    x = np.repeat(out[None], 3, 0).astype(np.float32) / 255.0
    want = (x - image_mod.IMAGENET_MEAN[:, None, None]) / image_mod.IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(outf, want, rtol=0, atol=0)

    from PIL import Image as PILImage

    ppath = tmp_path / "b.png"
    PILImage.fromarray(arr, "L").save(ppath)  # PNG → PIL fallback
    out_png = load_u8(str(ppath))
    assert out_png.shape == (96, 96) and out_png.dtype == np.uint8


def test_train_loader_native_fallback(tmp_path):
    """Non-JPEG (or unreadable) inputs silently fall back to the PIL path."""
    from PIL import Image as PILImage

    path = tmp_path / "img.png"
    PILImage.fromarray(np.zeros((64, 64), np.uint8), "L").save(path)  # PNG, not JPEG
    load = image_mod.make_train_loader_transform(size=32, seed=0, native_decode=True)
    out = load(str(path))
    assert out.shape == (3, 32, 32)


def test_eval_center_crop_rounding():
    """CenterCrop uses round((dim − size)/2) for the offset (torchvision
    functional.center_crop), banker's rounding included."""
    arr = np.arange(67 * 67 * 3, dtype=np.uint8).reshape(67, 67, 3)
    out = image_mod.center_crop(arr, 64)
    top = int(round((67 - 64) / 2.0))
    np.testing.assert_array_equal(out, arr[top : top + 64, top : top + 64])


# ------------------------------------------------------------ decoded-image cache
def test_decoded_cache_is_byte_identical_per_path(tmp_path):
    """Cached and uncached loader outputs are byte-identical for all three
    paths (the cache stores each transform's own deterministic uint8 prefix —
    data/image.py 'decoded-image cache'), and a hit never re-reads the JPEG."""
    arr = _smooth_image(500, 700)
    jpath = tmp_path / "a.jpg"
    jpath.write_bytes(_jpeg_bytes(arr, "L"))
    cdir = str(tmp_path / "cache")

    for make, kwargs in (
        (image_mod.make_eval_loader_transform, {}),
        (image_mod.make_fast_eval_loader_transform, {}),
        (image_mod.make_fast_eval_loader_transform, {"normalize": True}),
        (image_mod.make_train_loader_transform, {"seed": 3}),
    ):
        cold = make(size=96, **kwargs)(str(jpath))
        cached = make(size=96, cache_dir=cdir, **kwargs)
        first = cached(str(jpath))   # populates
        np.testing.assert_array_equal(first, cold)
        # corrupt the source: a hit must serve from cache without decoding
        data = jpath.read_bytes()
        st = jpath.stat()
        jpath.write_bytes(b"not a jpeg")
        os.utime(jpath, ns=(st.st_atime_ns, st.st_mtime_ns))  # keep the key
        # (size changed → key changed for real invalidation; restore size too)
        jpath.write_bytes(data[: len(b"not a jpeg")] + b"\0" * (len(data) - 10))
        os.utime(jpath, ns=(st.st_atime_ns, st.st_mtime_ns))
        warm = cached(str(jpath))
        np.testing.assert_array_equal(warm, cold)
        jpath.write_bytes(data)
        os.utime(jpath, ns=(st.st_atime_ns, st.st_mtime_ns))


def test_decoded_cache_warm_entry_point(tmp_path):
    """Cached loaders expose a decode-only ``warm`` attribute (what the
    CacheWarmer prefers): it fills the cache without paying the augment /
    normalize tail, a later load() is a pure hit byte-identical to a cold
    decode, and warming an existing entry is a no-op (no rewrite)."""
    arr = _smooth_image(500, 700)
    jpath = tmp_path / "w.jpg"
    jpath.write_bytes(_jpeg_bytes(arr, "L"))

    for i, (make, kwargs) in enumerate((
        (image_mod.make_eval_loader_transform, {}),
        (image_mod.make_fast_eval_loader_transform, {}),
        (image_mod.make_train_loader_transform, {"seed": 3}),
    )):
        cdir = str(tmp_path / f"cache{i}")
        cold = make(size=96, **kwargs)(str(jpath))
        assert not hasattr(make(size=96, **kwargs), "warm")  # uncached: no-op
        cached = make(size=96, cache_dir=cdir, **kwargs)
        cached.warm(str(jpath))
        entries = glob.glob(os.path.join(cdir, "*", "*.npy"))
        assert len(entries) == 1
        mtime = os.stat(entries[0]).st_mtime_ns
        cached.warm(str(jpath))  # already warm: must not rewrite
        assert os.stat(entries[0]).st_mtime_ns == mtime
        # corrupt the source in place (same key): a hit must serve from cache
        data = jpath.read_bytes()
        st = jpath.stat()
        jpath.write_bytes(b"x" * len(data))
        os.utime(jpath, ns=(st.st_atime_ns, st.st_mtime_ns))
        np.testing.assert_array_equal(cached(str(jpath)), cold)
        jpath.write_bytes(data)
        os.utime(jpath, ns=(st.st_atime_ns, st.st_mtime_ns))


def test_decoded_cache_invalidates_on_source_change(tmp_path):
    """Rewriting the source (different mtime/size) must invalidate the entry."""
    a = _smooth_image(300, 400)
    b = np.ascontiguousarray(a[::-1])  # different content
    jpath = tmp_path / "x.jpg"
    cdir = str(tmp_path / "cache")
    load = image_mod.make_fast_eval_loader_transform(size=96, cache_dir=cdir)

    jpath.write_bytes(_jpeg_bytes(a, "L"))
    out_a = load(str(jpath))
    jpath.write_bytes(_jpeg_bytes(b, "L"))
    os.utime(jpath, ns=(0, 12345))  # force a distinct mtime_ns
    out_b = load(str(jpath))
    fresh = image_mod.make_fast_eval_loader_transform(size=96)(str(jpath))
    np.testing.assert_array_equal(out_b, fresh)
    assert not np.array_equal(out_a, out_b)


def test_decoded_cache_train_epoch_variation(tmp_path):
    """Augmentation draws stay per-epoch (and deterministic) over a cache hit:
    the cache key excludes the epoch, augmentation happens after the load."""
    arr = _smooth_image(300, 400)
    jpath = tmp_path / "t.jpg"
    jpath.write_bytes(_jpeg_bytes(arr, "L"))
    cdir = str(tmp_path / "cache")

    plain = image_mod.make_train_loader_transform(size=96, seed=7)
    cached = image_mod.make_train_loader_transform(size=96, seed=7, cache_dir=cdir)
    cached(str(jpath))  # populate epoch-0 entry
    for epoch in (0, 1, 2):
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        np.testing.assert_array_equal(cached(str(jpath)), plain(str(jpath)))
    plain.set_epoch(0)
    cached.set_epoch(1)
    assert not np.array_equal(cached(str(jpath)), plain(str(jpath)))


def test_decoded_cache_rgb_source_roundtrip(tmp_path):
    """A genuinely-colour source must NOT be stored as replicated gray."""
    rgb = np.stack([
        _smooth_image(300, 400),
        np.roll(_smooth_image(300, 400), 7, 1),
        np.roll(_smooth_image(300, 400), 13, 0),
    ], axis=-1)
    jpath = tmp_path / "c.jpg"
    jpath.write_bytes(_jpeg_bytes(rgb, "RGB"))
    cdir = str(tmp_path / "cache")
    plain = image_mod.make_train_loader_transform(size=96, seed=1)
    cached = image_mod.make_train_loader_transform(size=96, seed=1, cache_dir=cdir)
    np.testing.assert_array_equal(cached(str(jpath)), plain(str(jpath)))  # miss
    np.testing.assert_array_equal(cached(str(jpath)), plain(str(jpath)))  # hit
