"""Native image loader (imgload.cpp): PIL parity, formats, batch, fallback.

The resampler replicates Pillow's fixed-point triangle-filter resampling and
the decoders ride the same libjpeg/libpng algorithms, so parity with
`Image.open(p).convert(mode).resize((s, s), BILINEAR)` is asserted EXACTLY
for PNG and within 1 LSB for JPEG (system libjpeg version skew tolerance —
observed 0 on this host).
"""
import numpy as np
import pytest
from PIL import Image

from fidm_tpu.native.build import load_imgload
from fidm_tpu.native.imgload import decode_resize, decode_resize_batch

lib = load_imgload()
pytestmark = pytest.mark.skipif(
    lib is None, reason="native toolchain or libjpeg/libpng absent"
)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (37, 53, 3), np.uint8)
    out = {}
    Image.fromarray(a).save(tmp / "rgb.png")
    out["rgb.png"] = tmp / "rgb.png"
    Image.fromarray(a).convert("P", palette=Image.ADAPTIVE).save(
        tmp / "pal.png"
    )
    out["pal.png"] = tmp / "pal.png"
    rgba = np.concatenate([a, rng.integers(0, 256, (37, 53, 1), np.uint8)], -1)
    Image.fromarray(rgba).save(tmp / "rgba.png")
    out["rgba.png"] = tmp / "rgba.png"
    Image.fromarray(a).convert("L").save(tmp / "gray.png")
    out["gray.png"] = tmp / "gray.png"
    Image.fromarray(a).save(tmp / "photo.jpg", quality=90)
    out["photo.jpg"] = tmp / "photo.jpg"
    return out


@pytest.mark.parametrize("name", ["rgb.png", "pal.png", "rgba.png",
                                  "gray.png", "photo.jpg"])
@pytest.mark.parametrize("size", [16, 53, 200])  # down / identity-w / up
@pytest.mark.parametrize("mode", ["RGB", "L"])
def test_pil_parity(files, name, size, mode):
    p = files[name]
    ours = decode_resize(p, size, mode)
    assert ours is not None
    ref = np.asarray(
        Image.open(p).convert(mode).resize((size, size), Image.BILINEAR)
    )
    atol = 1 if name.endswith(".jpg") else 0
    np.testing.assert_allclose(
        ours.astype(np.int16), ref.astype(np.int16), atol=atol
    )


def test_batch_matches_single_and_flags_failures(files, tmp_path):
    paths = [files["rgb.png"], files["photo.jpg"], tmp_path / "missing.png"]
    out, ok = decode_resize_batch(paths, 32, "RGB", nthreads=2)
    assert ok.tolist() == [True, True, False]
    assert out.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(out[0], decode_resize(paths[0], 32, "RGB"))
    np.testing.assert_array_equal(out[1], decode_resize(paths[1], 32, "RGB"))


def test_gray_batch_shape(files):
    out, ok = decode_resize_batch([files["gray.png"]], 24, "L")
    assert out.shape == (1, 24, 24) and bool(ok[0])


def test_16bit_png_rejected_for_pil_fallback(tmp_path):
    """Pillow CLAMPS 16-bit values on convert("L"/"RGB"); stripping the high
    byte would differ, so the native decoder must bail out on depth-16 PNGs
    and leave them to the PIL path."""
    a16 = (np.arange(20 * 20, dtype=np.uint32) * 163 % 65536).astype(np.uint16)
    p = tmp_path / "g16.png"
    Image.fromarray(a16.reshape(20, 20)).save(p)
    with Image.open(p) as im:  # precondition: really wrote a 16-bit PNG
        assert im.mode in ("I", "I;16")
    assert decode_resize(p, 16, "L") is None
    assert decode_resize(p, 16, "RGB") is None


def test_corrupt_file_returns_none(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0 not a real jpeg body")
    assert decode_resize(p, 16, "RGB") is None


def test_dataset_paths_use_native_with_identical_output(files, monkeypatch):
    """load_image / load_mask produce the same floats whether the native
    loader is active or force-disabled (PIL fallback)."""
    from fidm_tpu.data import dataset, masks
    from fidm_tpu.native import imgload

    img_native = dataset.load_image(files["photo.jpg"], 48)
    mask_native = masks.load_mask(files["gray.png"], 48)
    monkeypatch.setattr(imgload, "load_imgload", lambda: None)
    img_pil = dataset.load_image(files["photo.jpg"], 48)
    mask_pil = masks.load_mask(files["gray.png"], 48)
    # JPEG decode carries the same 1-LSB system-libjpeg skew tolerance as
    # test_pil_parity (1 LSB of u8 = 2/255 after [-1,1] normalization).
    np.testing.assert_allclose(img_native, img_pil, atol=2.01 / 255)
    np.testing.assert_array_equal(mask_native, mask_pil)
    assert img_native.dtype == np.float32
    assert img_native.min() >= -1.0 and img_native.max() <= 1.0


def test_pack_dataset_uses_batch_decode(files, tmp_path):
    from fidm_tpu.data.shards import ShardReader, pack_dataset

    src = tmp_path / "src"
    src.mkdir()
    for name in ("rgb.png", "photo.jpg"):
        (src / name).write_bytes(files[name].read_bytes())
    pack_dataset(src, tmp_path / "packed", img_size=32, shard_size=1)
    reader = ShardReader(tmp_path / "packed")
    assert len(reader) == 2
    for i, name in enumerate(sorted(["rgb.png", "photo.jpg"])):
        ref = np.asarray(
            Image.open(src / name)
            .convert("RGB")
            .resize((32, 32), Image.BILINEAR)
        )
        np.testing.assert_allclose(
            reader.get(i).astype(np.int16), ref.astype(np.int16), atol=1
        )
