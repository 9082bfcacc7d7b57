"""Parallel-package API contracts: mesh sizing fails loudly, the package
exports both round factories, and the shard_map multi-video round trains
EVERY video when local shards hold more than one (V > mesh size)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_make_mesh_rejects_overrequest():
    """Silent truncation handed back a smaller mesh than requested — a
    caller sizing V = n_devices then trained a fraction of its videos."""
    from ams_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="only"):
        make_mesh(len(jax.devices()) + 1)


def test_package_exports_both_round_factories():
    from ams_tpu.parallel import (  # noqa: F401
        make_multi_video_round,
        make_sharded_distill_round,
    )


@pytest.mark.slow
def test_multi_video_round_trains_all_videos_when_sharded_two_deep():
    """V=4 on a 2-device mesh: each shard carries TWO videos; the per-shard
    loop must run over the traced shard dim (a fixed videos_per_device=1
    default used to silently skip the second video on every device)."""
    from ams_tpu.distill.optimizer import adam_init
    from ams_tpu.distill.train_step import (
        DistillSpec,
        all_true_mask,
        split_params,
    )
    from ams_tpu.models.mobilenetv2_deeplab import init_student_params
    from ams_tpu.parallel.mesh import make_mesh
    from ams_tpu.parallel.sharded import make_multi_video_round, stack_videos

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    V, CAP, H, W = 4, 2, 64, 128
    mesh = make_mesh(2)
    spec = DistillSpec(iters=1, batch_size=2, num_classes=19,
                       class_indices=(0, 1, 2), strategy="full_model",
                       compute_dtype="bfloat16")
    rng = np.random.RandomState(0)
    vids = [init_student_params(jax.random.PRNGKey(s)) for s in range(V)]
    params_V = stack_videos(vids)
    opt_V = stack_videos([adam_init(split_params(p)[0]) for p in vids])
    mask_V = stack_videos([all_true_mask(p) for p in vids])
    frames_V = jnp.asarray(rng.randint(0, 256, (V, CAP, H, W, 3)), jnp.uint8)
    labels_V = jnp.asarray(rng.randint(0, 19, (V, CAP, H, W)), jnp.uint8)

    fn = make_multi_video_round(spec, mesh)
    pV, _oV, _mV, lossV = fn(params_V, opt_V, frames_V, labels_V,
                             jnp.full((V,), CAP, jnp.int32),
                             jnp.stack([jax.random.PRNGKey(100 + s)
                                        for s in range(V)]),
                             jnp.float32(1e-3), mask_V)

    assert lossV.shape == (V, spec.iters)
    assert np.isfinite(np.asarray(lossV)).all()
    k = "logits/semantic/biases"
    for j in range(V):  # j=1,3 are the second video of their device
        moved = np.abs(np.asarray(pV[k][j]) -
                       np.asarray(params_V[k][j])).max()
        assert moved > 0, "video %d was never trained" % j
