"""REST API layer (aiohttp), mirroring the reference's actix route surface."""
