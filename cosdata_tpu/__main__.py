"""CLI entry point: ``python -m cosdata_tpu --admin-key KEY [--config path]``.

Mirrors /root/reference/src/main.rs:29-53 + src/args.rs:5-15.
"""

from __future__ import annotations

import argparse
import logging


def main():
    parser = argparse.ArgumentParser("cosdata_tpu")
    parser.add_argument("--admin-key", required=True, help="admin key (required)")
    parser.add_argument("--config", default="config.toml", help="TOML config path")
    parser.add_argument("--data-path", default=None, help="override data path")
    parser.add_argument(
        "--skip-confirmation", action="store_true", help="accepted for CLI parity"
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from cosdata_tpu.config import load_config

    overrides = {}
    if args.data_path:
        overrides["data_path"] = args.data_path
    config = load_config(args.config, **overrides)

    from cosdata_tpu.core.app_context import AppContext
    from cosdata_tpu.api.server import run_server

    ctx = AppContext(config, admin_key=args.admin_key)
    run_server(ctx)


if __name__ == "__main__":
    main()
