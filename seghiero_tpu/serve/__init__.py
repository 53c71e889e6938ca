"""HTTP micro-batching serving daemon (see serve/server.py)."""

from seghiero_tpu.serve.server import (  # noqa: F401
    MicroBatcher,
    ServingModel,
    main,
    make_server,
)
