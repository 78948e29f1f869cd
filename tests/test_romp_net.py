"""Full ROMP network parity vs the torch reference (`simple_romp/romp/model.py`).

The reference ROMPv1 is instantiated with its default random init; its
state_dict is converted (layout-only) into our flat param dict; outputs on the
same input must match to float tolerance. This validates the entire HRNet-W32
+ CoordConv + 3-head graph AND the checkpoint converter at once.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from romp_tpu.models.romp import init_romp_params, romp_forward
from romp_tpu.models.layers import ParamStore
from romp_tpu.utils.checkpoint import (
    check_params_match, convert_torch_state_dict,
)
from tests._oracle import ref_model

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_romp_network_parity():
    torch.manual_seed(0)
    ref = ref_model().ROMPv1().eval()
    params_np = convert_torch_state_dict(ref.state_dict())
    # Exact coverage of our initialized tree (catches architecture drift).
    ours_init = init_romp_params(jax.random.PRNGKey(0))
    check_params_match(params_np, ours_init)

    rng = np.random.RandomState(0)
    image = rng.rand(1, 512, 512, 3).astype(np.float32) * 255.0

    with torch.no_grad():
        ref_center, ref_params = ref(torch.from_numpy(image))
    ref_center = ref_center.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
    ref_params = ref_params.numpy().transpose(0, 2, 3, 1)

    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    center, pmaps = jax.jit(
        lambda p, im: romp_forward(ParamStore(p), im)
    )(params, jnp.asarray(image))

    np.testing.assert_allclose(np.asarray(center), ref_center, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pmaps), ref_params, atol=2e-4)
    assert center.shape == (1, 64, 64, 1)
    assert pmaps.shape == (1, 64, 64, 145)
