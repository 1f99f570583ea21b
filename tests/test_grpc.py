"""In-process gRPC service tests (the reference's pattern,
src/grpc/vectors/tests.rs: construct AppContext, call services directly)."""

import numpy as np
import pytest
import grpc
from google.protobuf import empty_pb2

from cosdata_tpu.api.auth import SessionManager
from cosdata_tpu.config import load_config
from cosdata_tpu.core.app_context import AppContext
from cosdata_tpu.grpc_api import vector_service_pb2 as pb
from cosdata_tpu.grpc_api.server import build_server

ADMIN = "grpc-admin"


@pytest.fixture
def stack(tmp_path):
    ctx = AppContext(load_config(data_path=str(tmp_path / "data")), admin_key=ADMIN)
    sessions = SessionManager(ADMIN)
    server = build_server(ctx, sessions, address="127.0.0.1:0")
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    yield ctx, channel
    channel.close()
    server.stop(0)


def _call(channel, service, method, req, resp_cls, token=None):
    fn = channel.unary_unary(
        f"/vector_service.{service}/{method}",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=resp_cls.FromString,
    )
    md = [("authorization", f"Bearer {token}")] if token else []
    return fn(req, metadata=md, timeout=30)


class TestGrpc:
    def test_auth_required(self, stack):
        ctx, ch = stack
        with pytest.raises(grpc.RpcError) as e:
            _call(ch, "CollectionsService", "GetCollections",
                  pb.GetCollectionsRequest(), pb.GetCollectionsResponse)
        assert e.value.code() == grpc.StatusCode.UNAUTHENTICATED

    def test_bad_credentials(self, stack):
        ctx, ch = stack
        with pytest.raises(grpc.RpcError) as e:
            _call(ch, "AuthService", "CreateSession",
                  pb.CreateSessionRequest(username="admin", password="no"),
                  pb.CreateSessionResponse)
        assert e.value.code() == grpc.StatusCode.UNAUTHENTICATED

    def test_full_flow(self, stack):
        ctx, ch = stack
        tok = _call(
            ch, "AuthService", "CreateSession",
            pb.CreateSessionRequest(username="admin", password=ADMIN),
            pb.CreateSessionResponse,
        ).access_token

        _call(ch, "CollectionsService", "CreateCollection",
              pb.CreateCollectionRequest(
                  name="g1",
                  dense_vector=pb.DenseVectorOptions(enabled=True, dimension=32),
              ),
              pb.CreateCollectionResponse, tok)

        got = _call(ch, "CollectionsService", "GetCollection",
                    pb.GetCollectionRequest(collection_id="g1"),
                    pb.Collection, tok)
        assert got.name == "g1" and got.dense_vector.dimension == 32

        _call(ch, "IndexesService", "CreateDenseIndex",
              pb.CreateDenseIndexRequest(
                  collection_id="g1",
                  distance_metric_type="cosine",
                  scalar=pb.ScalarQuantization(
                      data_type="f32",
                      range=pb.ValuesRange(min=-1.0, max=1.0),
                  ),
                  hnsw_params=pb.HNSWParams(num_layers=2),
              ),
              empty_pb2.Empty, tok)

        x = np.random.default_rng(0).normal(size=(60, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        txn = _call(ch, "TransactionsService", "CreateTransaction",
                    pb.CreateTransactionRequest(collection_id="g1"),
                    pb.CreateTransactionResponse, tok).transaction_id
        req = pb.UpsertVectorsRequest(collection_id="g1", transaction_id=txn)
        for i in range(60):
            req.vectors.add(id=f"v{i}", dense_values=x[i].tolist())
        _call(ch, "TransactionsService", "UpsertVectors", req, empty_pb2.Empty, tok)
        _call(ch, "TransactionsService", "CommitTransaction",
              pb.CommitTransactionRequest(collection_id="g1", transaction_id=txn),
              empty_pb2.Empty, tok)
        ctx.indexing.wait_idle()

        resp = _call(ch, "VectorsService", "FindSimilarVectors",
                     pb.FindSimilarVectorsRequest(
                         collection_id="g1",
                         dense=pb.FindSimilarDenseVectorsQuery(
                             vector=x[9].tolist(), top_k=3
                         ),
                     ),
                     pb.FindSimilarVectorsResponse, tok)
        assert resp.matches[0].id == "v9"

        vec = _call(ch, "VectorsService", "GetVector",
                    pb.GetVectorRequest(collection_id="g1", vector_id="v9"),
                    pb.VectorResponse, tok)
        assert vec.vector.id == "v9"
        assert len(vec.vector.dense_values) == 32

    def test_not_found(self, stack):
        ctx, ch = stack
        tok = _call(
            ch, "AuthService", "CreateSession",
            pb.CreateSessionRequest(username="admin", password=ADMIN),
            pb.CreateSessionResponse,
        ).access_token
        with pytest.raises(grpc.RpcError) as e:
            _call(ch, "CollectionsService", "GetCollection",
                  pb.GetCollectionRequest(collection_id="ghost"),
                  pb.Collection, tok)
        assert e.value.code() == grpc.StatusCode.NOT_FOUND


class TestReflection:
    """grpcurl-style list/describe over the hand-implemented v1alpha
    reflection service (grpc/server.rs:24-44 parity)."""

    def _reflect(self, channel, req):
        from cosdata_tpu.grpc_api import reflection_v1alpha_pb2 as rpb

        fn = channel.stream_stream(
            "/grpc.reflection.v1alpha.ServerReflection/ServerReflectionInfo",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=rpb.ServerReflectionResponse.FromString,
        )
        return list(fn(iter([req]), timeout=30))

    def test_list_services(self, stack):
        from cosdata_tpu.grpc_api import reflection_v1alpha_pb2 as rpb

        _, ch = stack
        resps = self._reflect(
            ch, rpb.ServerReflectionRequest(host="", list_services="*")
        )
        assert len(resps) == 1
        names = {s.name for s in resps[0].list_services_response.service}
        assert "vector_service.CollectionsService" in names
        assert "vector_service.VectorsService" in names
        assert "grpc.reflection.v1alpha.ServerReflection" in names

    def test_describe_symbol(self, stack):
        """file_containing_symbol returns a descriptor closure a client
        can rebuild the schema from."""
        from google.protobuf import descriptor_pb2

        from cosdata_tpu.grpc_api import reflection_v1alpha_pb2 as rpb

        _, ch = stack
        resps = self._reflect(
            ch,
            rpb.ServerReflectionRequest(
                host="",
                file_containing_symbol="vector_service.CollectionsService",
            ),
        )
        files = resps[0].file_descriptor_response.file_descriptor_proto
        assert files, "no descriptors returned"
        protos = [descriptor_pb2.FileDescriptorProto.FromString(b) for b in files]
        names = {p.name for p in protos}
        assert any("vector_service" in n for n in names)
        svc_names = {
            s.name for p in protos for s in p.service
        }
        assert "CollectionsService" in svc_names

    def test_unknown_symbol_errors(self, stack):
        from cosdata_tpu.grpc_api import reflection_v1alpha_pb2 as rpb

        _, ch = stack
        resps = self._reflect(
            ch,
            rpb.ServerReflectionRequest(
                host="", file_containing_symbol="no.such.Symbol"
            ),
        )
        assert resps[0].WhichOneof("message_response") == "error_response"
