"""Model construction entry point (reference internal/models.py:2323-2358)."""

from __future__ import annotations

import jax

from neural_radiance_caching_tpu.engine.configs import ModelType
from neural_radiance_caching_tpu.models import nerf_model


def make_model(config, dataset=None):
    """Instantiate the configured model (gin bindings supply the params)."""
    del dataset
    if config.model_type == ModelType.DEFAULT:
        cls = (
            nerf_model.TransientNeRFModel if config.use_transient else nerf_model.NeRFModel
        )
        return cls(config=config)
    # MATERIAL / TRANSIENT_MATERIAL
    from neural_radiance_caching_tpu.models import material_model

    cls = (
        material_model.TransientMaterialModel
        if config.use_transient
        else material_model.MaterialModel
    )
    return cls(config=config)


def construct_model(rng, rays, config, dataset=None):
    """Build + init the model on example rays; returns (model, variables).

    init is jitted: on accelerators with remote/tunneled dispatch, eager
    op-by-op init is orders of magnitude slower than one compiled program.
    """
    import functools

    model = make_model(config, dataset=dataset)
    init_rays = jax.tree_util.tree_map(lambda x: x[:2] if hasattr(x, "shape") else x, rays)
    init_fn = jax.jit(
        functools.partial(model.init, train_frac=1.0, train=False, compute_extras=False)
    )
    variables = init_fn(rng, jax.random.PRNGKey(0), init_rays)
    return model, variables
