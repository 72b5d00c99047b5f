"""Online scoring service: JSON-over-HTTP serving for a trained model.

The reference stops at offline evaluation (serving is an explicit
non-goal, reference prd.md:23-27); this module closes the production
loop the framework targets. It reuses the exact serving primitives the
CLI already exposes — the fitted adapter's ``score_id_pairs`` /
``recommend_candidates`` and the trainer's compiled eval scan — behind
a dependency-free stdlib HTTP server:

  GET  /health              -> model/checkpoint metadata
  POST /score               -> {"rows": [[user, item, ts?], ...]}
                               => per-row pCTR (null for unknown ids)
  GET  /recommend?user=U&k=K[&include_seen=1]
                            -> top-K items for one user

This is the local reference server (single process, requests serialized
— the compiled scan makes each request one device dispatch per chunk).
Production deployments should front the exported StableHLO artifact
(`deepfm_tpu export`) with their RPC stack instead; see docs/SERVING.md.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class ServingError(ValueError):
    """Client error (HTTP 400/404): bad request shape or unknown entity."""

    def __init__(self, message: str, status: int = 400):
        super().__init__(message)
        self.status = status


class ScoringService:
    """Request-level serving logic, transport-agnostic (the HTTP layer
    below and the tests call these methods directly)."""

    def __init__(self, adapter, packed_schema, trainer, model_name: str):
        self.adapter = adapter
        self.packed = packed_schema
        self.trainer = trainer
        self.model_name = model_name
        self._requests = 0

    def warmup(self) -> None:
        """Compile the eval scan before the first request (first XLA
        compile is seconds-to-minutes; a scoring endpoint must not eat
        that on live traffic)."""
        ds, _ = self.adapter.score_id_pairs(
            np.zeros(1, np.int64), np.zeros(1, np.int64)
        )
        if len(ds) == 0:
            # id 0 unknown in this fit — warm with a known pair instead
            uid = next(iter(self.adapter._uid_pos))
            mid = next(iter(self.adapter._mid_pos))
            ds, _ = self.adapter.score_id_pairs(
                np.asarray([uid]), np.asarray([mid])
            )
        self.trainer.predict(ds.pack(self.packed))

    def health(self) -> dict:
        import jax

        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.trainer.state.params)
        )
        return {
            "status": "ok",
            "model": self.model_name,
            "n_params": n_params,
            "requests": self._requests,
        }

    def score(self, body: dict) -> dict:
        """Score [user, item] or [user, item, timestamp] rows. Unknown
        user/item pairs score null (dropped by the pipeline's metadata
        contract) rather than failing the batch."""
        rows = body.get("rows")
        if not isinstance(rows, list) or not rows:
            raise ServingError('expected {"rows": [[user, item, ts?], ...]}')
        try:
            arr = [[int(v) for v in r] for r in rows]
        except (TypeError, ValueError):
            raise ServingError("rows must be arrays of integers") from None
        if any(len(r) not in (2, 3) for r in arr):
            raise ServingError("each row is [user, item] or [user, item, ts]")
        users = np.asarray([r[0] for r in arr], np.int64)
        items = np.asarray([r[1] for r in arr], np.int64)
        ts = (
            np.asarray([r[2] if len(r) == 3 else -1 for r in arr], np.int64)
            if any(len(r) == 3 for r in arr)
            else None
        )
        if ts is not None and np.any(ts < 0):
            now = int(self.adapter._inter["timestamp"].max())
            ts = np.where(ts < 0, now, ts)
        ds, kept = self.adapter.score_id_pairs(users, items, None, ts)
        scores: list[float | None] = [None] * len(arr)
        if len(kept):
            vals = self.trainer.predict(ds.pack(self.packed))
            for i, v in zip(kept, vals):
                scores[int(i)] = float(v)
        self._requests += 1
        return {"scores": scores, "n_scored": int(len(kept))}

    def recommend(
        self, user: int, k: int, include_seen: bool = False
    ) -> dict:
        if k < 1:
            raise ServingError(f"k must be >= 1, got {k}")
        try:
            ds, item_ids = self.adapter.recommend_candidates(
                user, exclude_seen=not include_seen
            )
        except ValueError as e:
            raise ServingError(str(e), status=404) from None
        if len(item_ids) == 0:
            raise ServingError(f"user {user} has no unseen items", 404)
        scores = self.trainer.predict(ds.pack(self.packed))
        top = np.argsort(-scores)[:k]
        self._requests += 1
        return {
            "user": int(user),
            "items": [
                {"item": int(item_ids[i]), "score": float(scores[i])}
                for i in top
            ],
        }


def make_http_server(
    service: ScoringService, host: str = "127.0.0.1", port: int = 8080
) -> HTTPServer:
    """Bind an HTTPServer routing to ``service`` (``port=0`` picks an
    ephemeral port — the tests use that). Caller runs serve_forever()."""

    class Handler(BaseHTTPRequestHandler):
        # quiet the default per-request stderr lines
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _dispatch(self, fn) -> None:
            try:
                self._reply(200, fn())
            except ServingError as e:
                self._reply(e.status, {"error": str(e)})
            except Exception as e:  # serving must not kill the process
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def do_GET(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path == "/health":
                self._dispatch(service.health)
            elif url.path == "/recommend":
                q = parse_qs(url.query)

                def run():
                    if "user" not in q:
                        raise ServingError("missing ?user=")
                    try:
                        user = int(q["user"][0])
                        k = int(q.get("k", ["10"])[0])
                    except ValueError:
                        raise ServingError(
                            "user/k must be integers"
                        ) from None
                    include = q.get("include_seen", ["0"])[0] not in (
                        "0",
                        "false",
                        "",
                    )
                    return service.recommend(user, k, include)

                self._dispatch(run)
            else:
                self._reply(404, {"error": f"no route {url.path}"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/score":
                self._reply(404, {"error": f"no route {url.path}"})
                return

            def run():
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    raise ServingError("empty body")
                try:
                    body = json.loads(self.rfile.read(length))
                except json.JSONDecodeError:
                    raise ServingError("body is not valid JSON") from None
                return service.score(body)

            self._dispatch(run)

    return HTTPServer((host, port), Handler)
