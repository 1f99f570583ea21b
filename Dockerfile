# Deployment image (parity with the reference's Dockerfile: exposes the
# HTTP + gRPC ports, binds 0.0.0.0, data under /data).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY cosdata_tpu ./cosdata_tpu
COPY csrc ./csrc
COPY proto ./proto
COPY README.md ./

# jax/jaxlib (TPU wheel in production), serving deps
RUN pip install --no-cache-dir "jax[tpu]" aiohttp msgpack xxhash nltk grpcio protobuf \
    || pip install --no-cache-dir jax aiohttp msgpack xxhash nltk grpcio protobuf
RUN make -C csrc

ENV COSDATA_HOST=0.0.0.0
EXPOSE 8443 50051
VOLUME ["/data"]

ENTRYPOINT ["python", "-m", "cosdata_tpu", "--data-path", "/data"]
