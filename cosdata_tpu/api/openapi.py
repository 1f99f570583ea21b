"""OpenAPI document generation (the reference serves utoipa-generated JSON
per module at /api-docs/..., /root/reference/src/api/docs.rs:8-30)."""

from __future__ import annotations

from cosdata_tpu import __version__


def build_openapi(app) -> dict:
    paths: dict[str, dict] = {}
    for route in app.router.routes():
        info = route.resource.get_info() if route.resource else {}
        path = info.get("path") or info.get("formatter")
        if not path or route.method in ("HEAD", "OPTIONS", "*"):
            continue
        entry = paths.setdefault(path, {})
        entry[route.method.lower()] = {
            "operationId": f"{route.method.lower()}_{path.strip('/').replace('/', '_').replace('{', '').replace('}', '')}",
            "responses": {"200": {"description": "OK"}},
        }
    return {
        "openapi": "3.0.3",
        "info": {
            "title": "cosdata_tpu",
            "version": __version__,
            "description": "TPU-native vector database — REST API",
        },
        "paths": paths,
    }
