"""WalkingController jit static-arg identity contract.

The episode entry points are jitted with `self` static; jax keys static
args by __hash__/__eq__. Identity hashing is unsafe across controller
lifetimes (CPython id reuse after GC aliased the two arms of
`sweep --ablation` to one executable — see WalkingController.__hash__),
so controllers hash/compare by the frozen WalkingConfig value plus
model/weights identity.
"""

from cmw_tpu.cmpc.formulation import no_adjust
from cmw_tpu.core import kinematics as kin
from cmw_tpu.mann.network import load_mann_weights
from cmw_tpu.runtime.config import ergocub_gazebo_v1
from cmw_tpu.runtime.loop import WalkingController

MANN4 = (
    "/root/reference/src/centroidal-mpc-walking/config/robots/ergoCubGazeboV1/"
    "onnx_50_mann4_smaller_steps.onnx"
)


def test_controller_hash_by_config_value():
    model = kin.ergocub_approx()
    weights = load_mann_weights(MANN4)
    a = WalkingController(ergocub_gazebo_v1(), model, weights)
    b = WalkingController(ergocub_gazebo_v1(), model, weights)
    # same config value + same model/weights objects -> same jit cache key
    assert a == b and hash(a) == hash(b)

    # the ablation pair MUST key differently (this exact aliasing shipped
    # a bogus null ablation result before the value-hash fix)
    cfg_off = ergocub_gazebo_v1(mpc=no_adjust(ergocub_gazebo_v1().mpc))
    c = WalkingController(cfg_off, model, weights)
    assert a != c

    # different model object -> different key even with equal config
    model2 = kin.ergocub_approx()
    d = WalkingController(ergocub_gazebo_v1(), model2, weights)
    assert a != d

    # unrelated types never compare equal
    assert a != object()
