from topomap_tpu.serve.server import (  # noqa: F401
    MicroBatcher,
    ServeConfig,
    build_runner,
    make_http_server,
)
