"""StableHLO export round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_stablehlo_export_roundtrip(tmp_path):
    from romp_tpu.tools.export_stablehlo import export_romp, load_exported

    out = str(tmp_path / "romp.stablehlo")
    export_romp(str(tmp_path / "missing.npz"), out, batch=1,
                max_person=2)
    exported = load_exported(out)
    images = jnp.zeros((1, 512, 512, 3), jnp.float32)
    res = exported.call(images)
    # exported fn returns the full output dict as a pytree
    leaves = jax.tree_util.tree_leaves(res)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
