"""Fast (non-slow) unit tests of the checkpoint serializer itself."""

import jax.numpy as jnp
import numpy as np
import pytest

from ros_stereo_slam_tpu.utils import checkpoint


def test_bf16_leaf_roundtrip(tmp_path):
    """bfloat16 leaves (the loop detector's binned BoW database) must
    survive the npz round-trip: np.savez writes ml_dtypes bfloat16 as raw
    '|V2' void that jnp.asarray rejects, so save upcasts to f32 (exact)
    and load casts back to the template dtype."""
    tree = {
        "bins": jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (8, 16)), jnp.bfloat16
        ),
        "w": jnp.arange(5, dtype=jnp.int32),
        "x": jnp.ones((3,), jnp.float32),
    }
    path = str(tmp_path / "ck.npz")
    checkpoint.save_pytree(path, tree, {"frame": 7})
    back, meta = checkpoint.load_pytree(path, tree)
    assert meta["frame"] == 7
    assert back["bins"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back["bins"], np.float32), np.asarray(tree["bins"], np.float32)
    )
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(tree["w"]))


def test_structure_mismatch_raises(tmp_path):
    tree = {"a": jnp.ones((2,), jnp.float32)}
    path = str(tmp_path / "ck.npz")
    checkpoint.save_pytree(path, tree)
    with pytest.raises(ValueError):
        checkpoint.load_pytree(path, {"a": jnp.ones((3,), jnp.float32)})
