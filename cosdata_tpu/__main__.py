"""CLI entry point: ``python -m cosdata_tpu --admin-key KEY [--config path]``.

Mirrors /root/reference/src/main.rs:29-53 + src/args.rs:5-15.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main():
    parser = argparse.ArgumentParser("cosdata_tpu")
    parser.add_argument("--admin-key", required=True, help="admin key (required)")
    parser.add_argument("--config", default="config.toml", help="TOML config path")
    parser.add_argument("--data-path", default=None, help="override data path")
    parser.add_argument(
        "--skip-confirmation", action="store_true", help="accepted for CLI parity"
    )
    parser.add_argument("--no-grpc", action="store_true", help="disable gRPC server")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from cosdata_tpu.config import load_config

    overrides = {}
    if args.data_path:
        overrides["data_path"] = args.data_path
    # the default "config.toml" is optional (pure defaults when absent);
    # an EXPLICIT --config that doesn't exist fails fast in load_config
    cfg_path = args.config
    if cfg_path == "config.toml" and not Path(cfg_path).exists():
        cfg_path = None
    config = load_config(cfg_path, **overrides)
    import os

    if os.environ.get("COSDATA_HOST"):
        config.server.host = os.environ["COSDATA_HOST"]
        config.grpc.host = os.environ["COSDATA_HOST"]

    from cosdata_tpu.core.app_context import AppContext
    from cosdata_tpu.api.server import run_server

    ctx = AppContext(config, admin_key=args.admin_key)

    # absorb the per-process first-sync stall BEFORE any server accepts
    # requests (an early gRPC search would otherwise pay the 200-900s
    # cost; run_server warms again, which is a no-op)
    from cosdata_tpu.utils.device import warmup_device

    warmup_device()

    # spawn the gRPC server next to HTTP (main.rs:40-47 + grpc/server.rs:24-44)
    if not args.no_grpc:
        try:
            from cosdata_tpu.grpc_api.server import build_server

            grpc_server = build_server(ctx)
            grpc_server.start()
            logging.info(
                "gRPC server on %s:%s", config.grpc.host, config.grpc.port
            )
        except Exception:
            logging.exception("gRPC server failed to start; continuing with HTTP")

    run_server(ctx)


if __name__ == "__main__":
    main()
