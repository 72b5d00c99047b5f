"""Online serving: adapter.score_id_pairs + ScoringService + HTTP server.

The reference has no serving surface (prd.md:23-27 lists it as a
non-goal); these tests pin the framework's online path: in-memory pair
scoring matches the file-based predict pipeline feature-for-feature,
unknown entities degrade to null scores instead of failing a batch, and
the stdlib HTTP layer round-trips JSON against a live (ephemeral-port)
server over a trained tiny checkpoint.
"""

import json
import sys
import threading
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, "tests")

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.synthetic import generate_movielens_like  # noqa: E402


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlsynth_serve")
    generate_movielens_like(
        d, num_users=50, num_items=60, num_rows=2500, seed=11
    )
    return d


@pytest.fixture(scope="module")
def built_adapter(synth_dir):
    from deepfm_tpu.data.movielens import MovieLensAdapter

    cfg = config_from_dict(
        {
            "data": {
                "data_dir": str(synth_dir),
                "num_neg_train": 1,
                "num_neg_eval": 5,
            },
            "output_dir": "/tmp/serve_test",
        }
    )
    adapter = MovieLensAdapter(cfg.data, seed=42)
    adapter.build()
    return adapter


class TestScoreIdPairs:
    def test_matches_score_interactions(self, built_adapter, synth_dir):
        """The in-memory pairs path produces the identical features the
        file-based path does on the same (user, item, rating, ts) rows."""
        adapter = built_adapter
        raw = np.loadtxt(synth_dir / "u.data", dtype=np.int64).reshape(-1, 4)
        raw = raw[:64]
        ds_mem, kept_mem = adapter.score_id_pairs(
            raw[:, 0], raw[:, 1], raw[:, 2], raw[:, 3]
        )
        ds_file, kept_file, total = adapter.score_interactions(
            synth_dir / "u.data"
        )
        assert np.array_equal(kept_mem, np.arange(len(raw)))
        for name, arr in ds_mem.features.items():
            np.testing.assert_array_equal(
                arr, ds_file.features[name][: len(raw)], err_msg=name
            )

    def test_unknown_pairs_dropped(self, built_adapter):
        adapter = built_adapter
        known_u = next(iter(adapter._uid_pos))
        known_m = next(iter(adapter._mid_pos))
        users = np.asarray([known_u, 10**9, known_u], np.int64)
        items = np.asarray([known_m, known_m, 10**9], np.int64)
        ds, kept = adapter.score_id_pairs(users, items)
        assert list(kept) == [0]
        assert len(ds) == 1

    def test_default_timestamp_is_now(self, built_adapter):
        """Omitted timestamps stamp the newest fitted interaction, same
        default recommend_candidates uses."""
        adapter = built_adapter
        known_u = next(iter(adapter._uid_pos))
        known_m = next(iter(adapter._mid_pos))
        now = int(adapter._inter["timestamp"].max())
        ds_default, _ = adapter.score_id_pairs([known_u], [known_m])
        ds_explicit, _ = adapter.score_id_pairs(
            [known_u], [known_m], None, [now]
        )
        for name, arr in ds_default.features.items():
            np.testing.assert_array_equal(
                arr, ds_explicit.features[name], err_msg=name
            )

    def test_length_mismatch_raises(self, built_adapter):
        with pytest.raises(ValueError, match="mismatch"):
            built_adapter.score_id_pairs([1, 2], [3])

    def test_requires_build(self, synth_dir):
        from deepfm_tpu.data.movielens import MovieLensAdapter

        cfg = config_from_dict(
            {
                "data": {"data_dir": str(synth_dir)},
                "output_dir": "/tmp/serve_test2",
            }
        )
        with pytest.raises(RuntimeError, match="build"):
            MovieLensAdapter(cfg.data, seed=0).score_id_pairs([1], [1])


class _StubTrainer:
    """Deterministic stand-in: score = fraction of ids in the packed
    batch (transport tests don't need a trained model)."""

    class state:  # noqa: N801 — attribute-shaped stub
        params = {"w": np.zeros((3, 4))}

    def predict(self, packed_arrays):
        ids = np.asarray(packed_arrays.ids, np.float64)
        return (ids.mean(axis=1) % 997) / 997.0


def _make_service(adapter):
    from deepfm_tpu.data.packing import pack_schema
    from deepfm_tpu.serving import ScoringService

    packed = pack_schema(adapter._schema)
    return ScoringService(adapter, packed, _StubTrainer(), "deepfm")


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def http_server(built_adapter):
    from deepfm_tpu.serving import make_http_server

    service = _make_service(built_adapter)
    server = make_http_server(service, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()
    server.server_close()


class TestHTTPServer:
    def test_health(self, http_server):
        status, body = _get(f"{http_server}/health")
        assert status == 200
        assert body["status"] == "ok"
        assert body["model"] == "deepfm"
        assert body["n_params"] == 12

    def test_score_mixed_known_unknown(self, http_server, built_adapter):
        known_u = next(iter(built_adapter._uid_pos))
        known_m = next(iter(built_adapter._mid_pos))
        status, body = _post(
            f"{http_server}/score",
            {"rows": [[known_u, known_m], [10**9, known_m]]},
        )
        assert status == 200
        assert body["n_scored"] == 1
        assert isinstance(body["scores"][0], float)
        assert body["scores"][1] is None

    def test_score_bad_body(self, http_server):
        status, body = _post(f"{http_server}/score", {"rows": "nope"})
        assert status == 400 and "rows" in body["error"]
        status, body = _post(f"{http_server}/score", {"rows": [[1, 2, 3, 4]]})
        assert status == 400

    def test_recommend(self, http_server, built_adapter):
        known_u = next(iter(built_adapter._uid_pos))
        status, body = _get(f"{http_server}/recommend?user={known_u}&k=5")
        assert status == 200
        items = body["items"]
        assert 1 <= len(items) <= 5
        scores = [it["score"] for it in items]
        assert scores == sorted(scores, reverse=True)

    def test_recommend_unknown_user_404(self, http_server):
        status, body = _get(f"{http_server}/recommend?user=999999999&k=3")
        assert status == 404

    def test_unknown_route_404(self, http_server):
        status, body = _get(f"{http_server}/nope")
        assert status == 404


class TestGuards:
    def test_negative_timestamp_rejected(self, http_server, built_adapter):
        known_u, known_m = built_adapter.known_pair()
        status, body = _post(
            f"{http_server}/score", {"rows": [[known_u, known_m, -1]]}
        )
        assert status == 400 and "timestamp" in body["error"]

    def test_max_rows_rejected(self, built_adapter):
        from deepfm_tpu.data.packing import pack_schema
        from deepfm_tpu.serving import ScoringService, ServingError

        packed = pack_schema(built_adapter._schema)
        svc = ScoringService(
            built_adapter, packed, _StubTrainer(), "deepfm", max_rows=4
        )
        with pytest.raises(ServingError, match="too many rows"):
            svc.score({"rows": [[1, 1]] * 5})

    def test_body_size_cap_413(self, built_adapter):
        from deepfm_tpu.serving import make_http_server

        service = _make_service(built_adapter)
        server = make_http_server(
            service, "127.0.0.1", 0, max_body_bytes=64
        )
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            host, port = server.server_address
            status, body = _post(
                f"http://{host}:{port}/score",
                {"rows": [[1, 2]] * 50},
            )
            assert status == 413 and "too large" in body["error"]
        finally:
            server.shutdown()
            server.server_close()

    def test_ratings_length_mismatch_raises(self, built_adapter):
        with pytest.raises(ValueError, match="ratings/users"):
            built_adapter.score_id_pairs(
                [1, 2], [3, 4], np.asarray([1]), None
            )
        with pytest.raises(ValueError, match="timestamps/users"):
            built_adapter.score_id_pairs(
                [1, 2], [3, 4], None, np.asarray([5, 6, 7])
            )

    def test_public_accessors(self, built_adapter):
        u, m = built_adapter.known_pair()
        ds, kept = built_adapter.score_id_pairs([u], [m])
        assert list(kept) == [0]
        assert built_adapter.now_timestamp() == int(
            built_adapter._inter["timestamp"].max()
        )


class _CountingTrainer(_StubTrainer):
    def __init__(self):
        self.calls = 0

    def predict(self, packed_arrays):
        self.calls += 1
        return super().predict(packed_arrays)


class TestMicroBatcher:
    def test_concurrent_scores_coalesce(self, built_adapter):
        """Two /score requests inside one window share ONE device
        dispatch, and each gets exactly its own rows' scores."""
        from deepfm_tpu.data.packing import pack_schema
        from deepfm_tpu.serving import ScoringService

        packed = pack_schema(built_adapter._schema)
        trainer = _CountingTrainer()
        svc = ScoringService(
            built_adapter, packed, trainer, "deepfm",
            batch_window_ms=300.0,
        )
        u, m = built_adapter.known_pair()
        solo = ScoringService(
            built_adapter, packed, _CountingTrainer(), "deepfm"
        )
        want1 = solo.score({"rows": [[u, m]]})["scores"]
        want2 = solo.score({"rows": [[u, m], [10**9, m]]})["scores"]

        results = {}

        def call(key, rows):
            results[key] = svc.score({"rows": rows})

        t1 = threading.Thread(target=call, args=("a", [[u, m]]))
        t2 = threading.Thread(
            target=call, args=("b", [[u, m], [10**9, m]])
        )
        t1.start()
        t2.start()
        t1.join(timeout=60)
        t2.join(timeout=60)
        assert trainer.calls == 1  # coalesced into one dispatch
        assert results["a"]["scores"] == want1
        assert results["b"]["scores"] == want2

    def test_single_request_still_works(self, built_adapter):
        from deepfm_tpu.data.packing import pack_schema
        from deepfm_tpu.serving import ScoringService

        packed = pack_schema(built_adapter._schema)
        svc = ScoringService(
            built_adapter, packed, _CountingTrainer(), "deepfm",
            batch_window_ms=50.0,
        )
        u, m = built_adapter.known_pair()
        out = svc.score({"rows": [[u, m]]})
        assert out["n_scored"] == 1


@pytest.mark.slow
def test_serve_cli_end_to_end(synth_dir, tmp_path):
    """Full loop: train 1 epoch via the CLI, restore through the serve
    command's prologue, and answer real HTTP requests over the trained
    checkpoint (scores match the predict path's sigmoid range)."""
    from deepfm_tpu.cli import _restore_trainer, main
    from deepfm_tpu.config import load_config
    from deepfm_tpu.serving import ScoringService, make_http_server

    out_dir = tmp_path / "run"
    overrides = [
        f"data.data_dir={synth_dir}",
        "data.num_neg_train=1",
        "data.num_neg_eval=5",
        "training.num_epochs=1",
        "training.batch_size=512",
        "dnn.hidden_units=[16,8]",
        f"output_dir={out_dir}",
    ]
    main(
        ["train", "--config", "configs/deepfm_movielens.yaml",
         "--override", *overrides]
    )
    config = load_config("configs/deepfm_movielens.yaml", overrides)
    adapter, packed, _, _, _, trainer = _restore_trainer(
        config, require=("serve", "score_id_pairs")
    )
    service = ScoringService(adapter, packed, trainer, config.model_name)
    service.warmup()
    server = make_http_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address
        base = f"http://{host}:{port}"
        known_u = next(iter(adapter._uid_pos))
        known_m = next(iter(adapter._mid_pos))
        status, body = _post(
            f"{base}/score", {"rows": [[known_u, known_m]]}
        )
        assert status == 200
        assert 0.0 <= body["scores"][0] <= 1.0
        status, body = _get(f"{base}/recommend?user={known_u}&k=3")
        assert status == 200 and len(body["items"]) >= 1
        status, body = _get(f"{base}/health")
        assert status == 200 and body["requests"] == 2
    finally:
        server.shutdown()
        server.server_close()
