"""Metadata schema + filtered dense search (reference behavior:
tests/test_metadata_filters.py equivalents)."""

import numpy as np
import pytest

from cosdata_tpu.config import load_config
from cosdata_tpu.core.app_context import AppContext
from cosdata_tpu.metadata.filtering import compile_filter
from cosdata_tpu.metadata.schema import MetadataSchema

SCHEMA = {
    "fields": [
        {"name": "color", "values": ["red", "green", "blue"]},
        {"name": "size", "values": ["s", "m", "l"]},
    ],
    "supported_conditions": [{"op": "and", "field_names": ["color", "size"]}],
}


class TestSchema:
    def test_value_ids(self):
        s = MetadataSchema(SCHEMA)
        ids = s.value_ids({"color": "green"})
        assert ids == {"color": 1, "size": -1}
        with pytest.raises(ValueError):
            s.value_ids({"color": "purple"})
        with pytest.raises(ValueError):
            s.value_ids({"shape": "round"})

    def test_compile_filters(self):
        s = MetadataSchema(SCHEMA)
        field_ids = {
            "color": np.array([0, 1, 2, 0, -1]),
            "size": np.array([0, 0, 1, 2, 2]),
        }
        m = compile_filter(s, {"Is": {"field_name": "color", "field_value": "red",
                                      "operator": "Equal"}})(field_ids)
        np.testing.assert_array_equal(m, [True, False, False, True, False])

        m = compile_filter(s, {"And": [
            {"field_name": "color", "field_value": "red", "operator": "Equal"},
            {"field_name": "size", "field_value": "l", "operator": "Equal"},
        ]})(field_ids)
        np.testing.assert_array_equal(m, [False, False, False, True, False])

        m = compile_filter(s, {"Or": [
            {"field_name": "color", "field_value": "blue", "operator": "Equal"},
            {"field_name": "size", "field_value": "s", "operator": "Equal"},
        ]})(field_ids)
        np.testing.assert_array_equal(m, [True, True, True, False, False])

        # NotEqual requires the field to be set
        m = compile_filter(s, {"Is": {"field_name": "color", "field_value": "red",
                                      "operator": "NotEqual"}})(field_ids)
        np.testing.assert_array_equal(m, [False, True, True, False, False])

    def test_bad_filters(self):
        s = MetadataSchema(SCHEMA)
        with pytest.raises(ValueError):
            compile_filter(s, {"Nope": []})
        with pytest.raises(ValueError):
            compile_filter(s, {"Is": {"field_name": "ghost", "field_value": 1,
                                      "operator": "Equal"}})


class TestFilteredSearch:
    def _setup(self, tmp_path):
        ctx = AppContext(
            load_config(data_path=str(tmp_path / "data")), admin_key="k"
        )
        coll = ctx.create_collection(
            {
                "name": "mf",
                "dense_vector": {"enabled": True, "dimension": 32},
                "metadata_schema": SCHEMA,
            }
        )
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "f32"},
            hnsw_params={"num_layers": 3, "wave_size": 64},
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(90, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        colors = ["red", "green", "blue"]
        coll.stream_upsert(
            [
                {
                    "id": f"v{i}",
                    "dense_values": x[i].tolist(),
                    "metadata": {"color": colors[i % 3]},
                }
                for i in range(90)
            ]
        )
        return ctx, coll, x

    def test_filtered_results_respect_filter(self, tmp_path):
        ctx, coll, x = self._setup(tmp_path)
        f = {"Is": {"field_name": "color", "field_value": "red", "operator": "Equal"}}
        res = coll.search_dense([x[0].tolist()], top_k=10, filter_dto=f)[0]
        assert res, "filtered search returned nothing"
        assert res[0]["id"] == "v0"  # v0 is red (0 % 3 == 0)
        for r in res:
            i = int(r["id"][1:])
            assert i % 3 == 0, f"{r['id']} is not red"

    def test_filter_excludes_query_self(self, tmp_path):
        ctx, coll, x = self._setup(tmp_path)
        f = {"Is": {"field_name": "color", "field_value": "green",
                    "operator": "Equal"}}
        res = coll.search_dense([x[0].tolist()], top_k=5, filter_dto=f)[0]
        for r in res:
            assert int(r["id"][1:]) % 3 == 1

    def test_filter_without_schema_errors(self, tmp_path):
        ctx = AppContext(
            load_config(data_path=str(tmp_path / "d2")), admin_key="k"
        )
        coll = ctx.create_collection(
            {"name": "ns", "dense_vector": {"enabled": True, "dimension": 8}}
        )
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"})
        with pytest.raises(ValueError, match="no metadata schema"):
            coll.search_dense([[0.0] * 8], filter_dto={"Is": {}})

    @pytest.mark.parametrize("selectivity", [0.15, 0.3, 0.5])
    def test_mid_selectivity_graph_path_fills_topk(self, selectivity):
        """Mid-selectivity filters ride the oversampled graph path
        (selectivity > 0.10); any query whose post-filter survivors
        under-fill top_k must escalate to the exact masked scan
        (query_filtering.rs:7-110: the contract is the correct filtered
        top-k, not best-effort)."""
        from cosdata_tpu.core.collection import DenseIndexHandle

        n, d, k = 4000, 48, 10
        rng = np.random.default_rng(int(selectivity * 100))
        x = rng.normal(size=(n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        h = DenseIndexHandle(
            dimension=d,
            quantization={"type": "scalar", "data_type": "f32"},
            hnsw_params={"num_layers": 3, "ef_search": 64},
        )
        h.graph_filter_min = 0  # force the graph path at this small n
        h.flat_serve_threshold = 0
        h.add_batch(list(range(n)), x)
        mask = rng.random(n) < selectivity
        q = x[:16]
        ids, scores = h.search(q, top_k=k, row_mask=mask)
        # exact masked reference
        sims = q @ x.T
        sims[:, ~mask] = -np.inf
        true_ids = np.argsort(-sims, axis=1)[:, :k]
        assert (ids >= 0).all(), "under-filled top_k at mid selectivity"
        for b in range(len(q)):
            got = set(map(int, ids[b]))
            assert all(mask[i] for i in got), "filter violated"
            rec = len(got & set(map(int, true_ids[b]))) / k
            assert rec >= 0.9, f"recall {rec} at selectivity {selectivity}"

    def test_metadata_validation_on_upsert(self, tmp_path):
        ctx, coll, x = self._setup(tmp_path)
        with pytest.raises(ValueError):
            coll.stream_upsert(
                [{"id": "bad", "dense_values": x[0].tolist(),
                  "metadata": {"color": "purple"}}]
            )
