"""scan_layers=True (nn.scan over weight-stacked conformer blocks) must be
the same math as the unrolled stack — verified by stacking the unrolled
per-layer params into the scan layout and asserting output equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_tpu.models.conformer import ConformerEncoder


def _make(scan):
    return ConformerEncoder(
        d_model=16, num_heads=2, d_ff=32, num_layers=3, kernel_size=7,
        dropout_rate=0.0, subsampling_factor=4, scan_layers=scan,
    )


def test_scan_layers_matches_unrolled():
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 40, 8), jnp.float32)
    lens = jnp.asarray([40, 33], jnp.int32)
    import flax.linen as nn

    unrolled = _make(False)
    params = nn.meta.unbox(
        unrolled.init(jax.random.PRNGKey(0), feats, lens, True)["params"]
    )
    out_ref, olens_ref = unrolled.apply({"params": params}, feats, lens, True)

    # restack: params["layer{i}"] -> params["block"] with leading layer axis
    layers = [params[f"layer{i}"] for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    scan_params = {
        k: v for k, v in params.items() if not k.startswith("layer")
    }
    scan_params["block"] = stacked

    scanned = _make(True)
    out, olens = scanned.apply({"params": scan_params}, feats, lens, True)
    np.testing.assert_array_equal(np.asarray(olens), np.asarray(olens_ref))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_scan_layers_grad_and_init():
    feats = jnp.asarray(np.random.RandomState(1).randn(2, 40, 8), jnp.float32)
    lens = jnp.asarray([40, 40], jnp.int32)
    import flax.linen as nn

    model = _make(True)
    variables = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), feats, lens, True)
    )
    # stacked leaves carry the layer axis
    k0 = variables["params"]["block"]["ff1"]["w1"]["kernel"]
    assert k0.shape[0] == 3

    def loss(p):
        out, _ = model.apply(
            {"params": p}, feats, lens, False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_scan_layers_rejects_interctc():
    model = ConformerEncoder(
        d_model=16, num_heads=2, d_ff=32, num_layers=3,
        scan_layers=True, capture_layers=(2,),
    )
    feats = jnp.zeros((1, 40, 8))
    lens = jnp.asarray([40], jnp.int32)
    with pytest.raises(ValueError, match="scan_layers"):
        model.init(jax.random.PRNGKey(0), feats, lens, True)
