"""Native (C++) JPEG decode + resize loader: parity with PIL and fallback.

The loader (lavt_rs_tpu/native/jpeg_loader.cc) implements Pillow's
triangle-filter resampling; Pillow accumulates in fixed point while the
native path uses float, so outputs may differ by 1 uint8 LSB — below bf16
resolution after ImageNet normalization, i.e. model-equivalent.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from lavt_rs_tpu import native
from lavt_rs_tpu.data.transforms import load_image_resized, resize_rgb_np


def _photo(h=480, w=640, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(np.cumsum(rng.normal(0, 8, (h, w, 3)), axis=1) + 128,
                   0, 255).astype(np.uint8)


def _jpeg_bytes(arr, quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native loader did not build")


@needs_native
def test_decode_resize_matches_pil():
    data = _jpeg_bytes(_photo())
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                     .resize((480, 480), Image.BILINEAR))
    nat = native.decode_resize_jpeg(data, 480, 480)
    assert nat.shape == (480, 480, 3) and nat.dtype == np.uint8
    assert np.abs(pil.astype(int) - nat.astype(int)).max() <= 1


@needs_native
@pytest.mark.parametrize("shape", [(320, 427), (480, 640), (64, 64)])
def test_resize_rgb_matches_pil(shape):
    # covers upscale (video 320H -> 480), downscale, and identity-ish
    img = _photo(*shape, seed=3)
    pil = np.asarray(Image.fromarray(img).resize((480, 480), Image.BILINEAR))
    nat = native.resize_rgb(img, 480, 480)
    assert np.abs(pil.astype(int) - nat.astype(int)).max() <= 1


@needs_native
def test_identity_resize_is_exact():
    img = _photo(480, 480, seed=4)
    nat = native.resize_rgb(img, 480, 480)
    np.testing.assert_array_equal(img, nat)


@needs_native
def test_jpeg_dims_and_bad_payload():
    data = _jpeg_bytes(_photo(123, 321))
    assert native.jpeg_dims(data) == (123, 321)
    assert native.decode_resize_jpeg(b"\xff\xd8not a jpeg", 8, 8) is None


@needs_native
def test_grayscale_jpeg_decodes_to_rgb():
    gray = _photo(100, 120)[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, "JPEG", quality=90)
    data = buf.getvalue()
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                     .resize((64, 64), Image.BILINEAR))
    nat = native.decode_resize_jpeg(data, 64, 64)
    assert np.abs(pil.astype(int) - nat.astype(int)).max() <= 1


def test_load_image_resized_jpeg_and_png(tmp_path):
    """The data-layer helper: native for JPEGs, PIL fallback for PNG, and
    the host_normalize toggle."""
    img = _photo(200, 300, seed=5)
    jp = os.path.join(tmp_path, "a.jpg")
    pp = os.path.join(tmp_path, "a.png")
    Image.fromarray(img).save(jp, quality=90)
    Image.fromarray(img).save(pp)

    for path in (jp, pp):
        u8 = load_image_resized(path, 64, host_normalize=False)
        assert u8.dtype == np.uint8 and u8.shape == (64, 64, 3)
        ref = np.asarray(Image.open(path).convert("RGB")
                         .resize((64, 64), Image.BILINEAR))
        assert np.abs(ref.astype(int) - u8.astype(int)).max() <= 1
        f32 = load_image_resized(path, 64, host_normalize=True)
        assert f32.dtype == np.float32

    # resize_rgb_np helper has the same contract
    r = resize_rgb_np(img, 64)
    ref = np.asarray(Image.fromarray(img).resize((64, 64), Image.BILINEAR))
    assert np.abs(ref.astype(int) - r.astype(int)).max() <= 1


def test_fallback_when_native_missing(monkeypatch, tmp_path):
    """With the shared object unavailable the helpers silently use PIL."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    assert not native.available()
    assert native.decode_resize_jpeg(b"\xff\xd8x", 8, 8) is None

    img = _photo(100, 100, seed=6)
    jp = os.path.join(tmp_path, "b.jpg")
    Image.fromarray(img).save(jp, quality=90)
    out = load_image_resized(jp, 32, host_normalize=False)
    ref = np.asarray(Image.open(jp).convert("RGB")
                     .resize((32, 32), Image.BILINEAR))
    np.testing.assert_array_equal(out, ref)
    r = resize_rgb_np(img, 32)
    ref2 = np.asarray(Image.fromarray(img).resize((32, 32), Image.BILINEAR))
    np.testing.assert_array_equal(r, ref2)
