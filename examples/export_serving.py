"""Serving deployment: train, export ONE StableHLO artifact, score it
from a process that never imports deepfm_tpu.

The exported artifact embeds the fitted parameters, carries a symbolic
batch dimension (one artifact, any batch size), and deserializes with
nothing but ``jax.export`` — exactly what a serving host needs. The
consumer below runs in a SUBPROCESS with the package import blocked to
prove the artifact is self-contained.

    python examples/export_serving.py
"""

# allow running straight from a source checkout (repo root on sys.path)
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # runnable anywhere

import numpy as np  # noqa: E402

from deepfm_tpu.config import config_from_dict  # noqa: E402
from deepfm_tpu.data.packing import pack_schema  # noqa: E402
from deepfm_tpu.data.schema import (  # noqa: E402
    DatasetSchema,
    FeatureType,
    FieldSchema,
)
from deepfm_tpu.models import create_model  # noqa: E402
from deepfm_tpu.utils.export import (  # noqa: E402
    export_scoring,
    save_scoring,
    serving_config,
)

# --- a tiny model (any trained checkpoint works the same way) ----------
fields = {
    "user": FieldSchema("user", FeatureType.SPARSE, 500, 8, "user"),
    "item": FieldSchema("item", FeatureType.SPARSE, 800, 8, "item"),
    "hour": FieldSchema("hour", FeatureType.DENSE, 0, 4, "context"),
}
packed = pack_schema(DatasetSchema(fields=fields))
cfg = serving_config(
    config_from_dict(
        {"feature": {"fm_embed_dim": 8}, "dnn": {"hidden_units": [16]}}
    )
)
model = create_model("deepfm", packed, cfg)
ids = np.zeros((4, packed.num_slots), np.int32)
dense = np.zeros((4, packed.num_dense), np.float32)
variables = model.init(jax.random.PRNGKey(0), ids, dense, train=False)

# --- export ------------------------------------------------------------
out = Path(tempfile.mkdtemp()) / "deepfm.stablehlo"
exported = export_scoring(
    model,
    variables["params"],
    variables.get("batch_stats", {}),
    packed.num_slots,
    packed.num_dense,
)
n = save_scoring(out, exported)
print(f"exported {out} ({n} bytes, in_avals={exported.in_avals})")

# --- consume from a clean process (deepfm_tpu import BLOCKED) ----------
consumer = f"""
import sys
sys.modules["deepfm_tpu"] = None  # importing the package would crash
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax import export
scorer = export.deserialize(open({str(out)!r}, "rb").read())
for b in (3, 17):  # symbolic batch: same artifact, different sizes
    ids = np.random.default_rng(b).integers(
        0, 400, (b, {packed.num_slots})).astype(np.int32)
    dense = np.zeros((b, {packed.num_dense}), np.float32)
    probs = np.asarray(scorer.call(ids, dense))
    assert probs.shape == (b,) and ((probs >= 0) & (probs <= 1)).all()
    print(f"scored batch {{b}}: first prob {{probs[0]:.4f}}")
print("consumer OK: no deepfm_tpu import needed")
"""
subprocess.run([sys.executable, "-c", consumer], check=True)
