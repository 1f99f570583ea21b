"""Host-side persistence: metadata KV, WAL, versioning, snapshots."""
