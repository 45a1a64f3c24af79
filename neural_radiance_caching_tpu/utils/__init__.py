from neural_radiance_caching_tpu.utils.pytrees import (  # noqa: F401
    Batch,
    Pixels,
    Rays,
    dummy_rays,
    random_rays,
)
from neural_radiance_caching_tpu.utils.jaxutil import (  # noqa: F401
    apply_stopgrad_fields,
    copy_tree,
    partial_stopgrad_rays,
    random_split,
    stopgrad_with_weight,
)
