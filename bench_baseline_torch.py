"""Reference-equivalent PyTorch DeepFM baseline for bench.py's vs_baseline.

A from-scratch eager-PyTorch DeepFM matching the reference architecture
(shared per-field embeddings + first-order embeddings, FM sum-of-squares
interaction, [512,256,128] MLP with BatchNorm, BCEWithLogits + Adam —
reference: deepfm/models/deepfm.py, deepfm/models/layers/*.py) run on this
host's CPU, which is the reference's execution model (eager torch on
CPU/MPS; reference cli.py:16-25 — no CUDA, no TPU). Measures full train
steps (fwd+bwd+opt) and returns examples/sec.
"""

from __future__ import annotations

import time

import numpy as np


def measure(
    batch: int = 16384,
    num_fields: int = 26,
    vocab: int = 400_000,
    embed_dim: int = 16,
    steps: int = 3,
) -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class TorchDeepFM(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.emb = nn.ModuleList(
                [nn.Embedding(vocab, embed_dim) for _ in range(num_fields)]
            )
            self.fo = nn.ModuleList(
                [nn.Embedding(vocab, 1) for _ in range(num_fields)]
            )
            hidden = [512, 256, 128]
            layers: list[nn.Module] = []
            in_dim = num_fields * embed_dim
            for h in hidden:
                layers += [nn.Linear(in_dim, h), nn.BatchNorm1d(h), nn.ReLU()]
                in_dim = h
            self.mlp = nn.Sequential(*layers)
            self.out = nn.Linear(in_dim, 1)

        def forward(self, ids: "torch.Tensor") -> "torch.Tensor":
            fe = torch.stack(
                [e(ids[:, i]) for i, e in enumerate(self.emb)], dim=1
            )  # (B, F, D)
            fo = torch.stack(
                [e(ids[:, i]) for i, e in enumerate(self.fo)], dim=1
            ).sum(dim=(1, 2), keepdim=False)[:, None]
            sq_sum = fe.sum(1).pow(2)
            sum_sq = fe.pow(2).sum(1)
            fm = 0.5 * (sq_sum - sum_sq).sum(1, keepdim=True)
            flat = fe.reshape(fe.size(0), -1)
            dnn = self.out(self.mlp(flat))
            return fo + fm + dnn

    model = TorchDeepFM()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = nn.BCEWithLogitsLoss()

    rng = np.random.default_rng(0)
    ids = torch.from_numpy(rng.integers(0, vocab, (batch, num_fields)))
    labels = torch.from_numpy(
        rng.integers(0, 2, batch).astype(np.float32)
    )

    # one warmup step
    loss = crit(model(ids)[:, 0], labels)
    opt.zero_grad()
    loss.backward()
    opt.step()

    t0 = time.perf_counter()
    for _ in range(steps):
        loss = crit(model(ids)[:, 0], labels)
        opt.zero_grad()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


if __name__ == "__main__":
    print(measure())
