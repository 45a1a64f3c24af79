"""gin shim for running the REFERENCE (read-only, /root/reference) on CPU.

Backed by this framework's from-scratch gin engine
(neural_radiance_caching_tpu/engine/gin_config.py): the reference's
@gin.configurable decorators register its classes into our engine's
registry, so the reference's OWN published gin files (e.g.
configs/ngp_yobo.gin) can be parsed and drive its model construction — the
apples-to-apples baseline harness in benchmarks/reference_cpu_bench.py
depends on this.

Only imported via benchmarks/ref_shims on sys.path; never by the framework.
"""
import types

from neural_radiance_caching_tpu.engine.gin_config import (  # noqa: F401
    GinError,
    bind,
    clear_config,
    configurable,
    constant,
    constants_from_enum,
    external_configurable,
    get_bindings,
    operative_config_str,
    parse_config,
    parse_config_file,
    parse_config_files_and_bindings,
    query_parameter,
)

config = types.SimpleNamespace(external_configurable=external_configurable)


def config_str():
    return operative_config_str()


def add_config_file_search_path(path):
    pass


REQUIRED = object()
