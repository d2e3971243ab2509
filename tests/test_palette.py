import numpy as np

from cvcs_tpu.data.palette import GID15Palette, PALETTE, NUM_CLASSES


def test_roundtrip():
    pal = GID15Palette()
    mask = np.arange(NUM_CLASSES).reshape(4, 4)
    rgb = np.asarray(pal.decode_u8(mask))
    assert rgb.shape == (4, 4, 3)
    np.testing.assert_array_equal(rgb.reshape(-1, 3), PALETTE)
    back = pal.encode(rgb)
    np.testing.assert_array_equal(back, mask)


def test_out_of_palette_renders_white():
    # reference `converters.py:33` initializes output to ones (quirk 9)
    pal = GID15Palette()
    rgb = np.asarray(pal.decode(np.array([[99]])))
    np.testing.assert_allclose(rgb[0, 0], [1.0, 1.0, 1.0])


def test_decode_is_normalized_palette():
    pal = GID15Palette()
    rgb = np.asarray(pal.decode(np.array([[1]])))
    np.testing.assert_allclose(rgb[0, 0], PALETTE[1] / 255.0)


def test_decode_u8_host_matches_device():
    # exports transfer uint8 labels and LUT-decode on host; must agree with
    # the on-device one-hot decode, incl. the white out-of-palette quirk
    pal = GID15Palette()
    rng = np.random.default_rng(0)
    mask = rng.integers(0, NUM_CLASSES + 3, (7, 9)).astype(np.int32)
    np.testing.assert_array_equal(
        pal.decode_u8_host(mask), np.asarray(pal.decode_u8(mask)))
