"""Resize ops vs torch.nn.functional.interpolate golden values; direct
halo-exchange unit behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvcs_tpu.ops.resize import resize_bilinear, resize_nearest, upsample_bilinear


class TestResizeTorchParity:
    def _torch_interp(self, x_nhwc, size, mode, antialias=False):
        torch = pytest.importorskip("torch")
        t = torch.tensor(x_nhwc.transpose(0, 3, 1, 2))
        out = torch.nn.functional.interpolate(t, size=size, mode=mode,
                                              antialias=antialias)
        return out.numpy().transpose(0, 2, 3, 1)

    def test_upsample_2x_matches_torch_bilinear(self):
        x = np.random.default_rng(0).random((1, 7, 9, 3)).astype(np.float32)
        ours = np.asarray(upsample_bilinear(jnp.asarray(x), 2))
        ref = self._torch_interp(x, (14, 18), "bilinear")
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resize_bilinear_upscale_matches_torch(self):
        x = np.random.default_rng(1).random((2, 8, 8, 4)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (13, 11)))
        ref = self._torch_interp(x, (13, 11), "bilinear")
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resize_bilinear_downscale_is_antialiased(self):
        """jax.image.resize antialiases downscale — the torchvision v2
        Resize(antialias=True) semantics the reference's context crops use
        (`dataset.py:152-156`), NOT torch interpolate's default."""
        x = np.random.default_rng(2).random((1, 12, 12, 2)).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (5, 5)))
        ref = self._torch_interp(x, (5, 5), "bilinear", antialias=True)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resize_nearest_label_safe(self):
        x = jnp.asarray(np.arange(16).reshape(1, 4, 4).astype(np.int32))
        out = np.asarray(resize_nearest(x, (8, 8)))
        # only original label values appear (no interpolation bleed)
        assert set(np.unique(out)) <= set(range(16))


class TestHaloUnit:
    def test_single_axis_pads_zeros(self):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from cvcs_tpu.core.mesh import MeshConfig, create_mesh
        from cvcs_tpu.parallel.halo import exchange_row_halo

        mesh = create_mesh(MeshConfig(data=1, spatial=8))
        x = jnp.arange(8 * 4 * 2, dtype=jnp.float32).reshape(8 * 4, 2)

        def body(local):
            return exchange_row_halo(local, 2, "spatial")

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P("spatial", None),),
                       out_specs=P("spatial", None), check_rep=False)
        out = np.asarray(fn(x)).reshape(8, 8, 2)  # 8 devices x (4+2+2) rows
        x_np = np.asarray(x).reshape(8, 4, 2)
        # device 0: top halo zeros, bottom halo = device 1's top rows
        assert (out[0, :2] == 0).all()
        np.testing.assert_array_equal(out[0, 2:6], x_np[0])
        np.testing.assert_array_equal(out[0, 6:], x_np[1][:2])
        # device 7: bottom halo zeros, top halo = device 6's bottom rows
        assert (out[7, 6:] == 0).all()
        np.testing.assert_array_equal(out[7, :2], x_np[6][2:])

    def test_sharded_rows_divisibility(self):
        from cvcs_tpu.parallel.halo import sharded_rows

        assert sharded_rows(32, 8) == 4
        with pytest.raises(ValueError):
            sharded_rows(30, 8)
