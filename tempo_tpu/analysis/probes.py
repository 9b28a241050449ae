"""Linear / MLP probes from VAE latents to L2 atmospheric products.

Parity with the reference probe training (reference:
src/scripts/linear_probe_analysis.py:212-353): probe = Linear(32->1) or
MLP(32->hidden...->1) with ReLU/GELU/Tanh + dropout; AdamW(lr, wd=0.01),
MSE loss, per-epoch shuffled minibatches (batch 512), best-val-epoch model
selection; reported R^2 and MSE on the held-out split.

Implemented as one jitted epoch (lax.scan over minibatches) — hundreds to
thousands of epochs run orders of magnitude faster than the reference's
per-batch eager loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tempo_tpu.nn.init import torch_bias_init, torch_dense_kernel_init

_ACTS = {"relu": jax.nn.relu, "gelu": lambda x: jax.nn.gelu(x, approximate=False),
         "tanh": jnp.tanh}


def init_probe_params(key: jax.Array, input_dim: int,
                      hidden_dims: Tuple[int, ...], output_dim: int = 1
                      ) -> List[Dict[str, jax.Array]]:
    dims = [input_dim, *hidden_dims, output_dim]
    layers = []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        kernel = torch_dense_kernel_init()(k1, (dims[i], dims[i + 1]))
        bias = torch_bias_init(dims[i])(k2, (dims[i + 1],))
        layers.append({"kernel": kernel, "bias": bias})
    return layers


def probe_apply(params: List[Dict[str, jax.Array]], x: jax.Array,
                act: str = "relu", dropout: float = 0.0,
                rng: Optional[jax.Array] = None) -> jax.Array:
    act_fn = _ACTS[act]
    h = x
    n = len(params)
    for i, layer in enumerate(params):
        h = h @ layer["kernel"] + layer["bias"]
        if i < n - 1:
            h = act_fn(h)
            if dropout > 0.0 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return h


@dataclass
class ProbeResult:
    params: List[Dict[str, np.ndarray]]
    train_losses: List[float]
    val_losses: List[float]
    best_epoch: int
    best_val_loss: float
    architecture: str
    hidden_dims: Tuple[int, ...] = ()
    activation: str = "relu"
    extras: Dict[str, Any] = field(default_factory=dict)

    def predict(self, x: np.ndarray) -> np.ndarray:
        params = jax.tree_util.tree_map(jnp.asarray, self.params)
        return np.asarray(probe_apply(params, jnp.asarray(x),
                                      act=self.activation)).squeeze(-1)

    def save(self, path) -> None:
        flat = {}
        for i, layer in enumerate(self.params):
            flat[f"kernel_{i}"] = np.asarray(layer["kernel"])
            flat[f"bias_{i}"] = np.asarray(layer["bias"])
        np.savez(path, n_layers=len(self.params), architecture=self.architecture,
                 activation=self.activation, **flat)


def r2_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - np.mean(y_true)) ** 2)
    return float(1.0 - ss_res / (ss_tot + 1e-30))


def train_probe(X_train: np.ndarray, y_train: np.ndarray,
                X_val: np.ndarray, y_val: np.ndarray,
                config: Dict[str, Any], seed: int = 0,
                verbose: bool = False) -> ProbeResult:
    """config keys (reference schema): architecture ('linear'|'mlp'),
    hidden_dims, dropout, activation, learning_rate, weight_decay,
    batch_size, max_epochs."""
    architecture = config.get("architecture", "linear")
    hidden_dims = tuple(config.get("hidden_dims", [512, 512])) \
        if architecture == "mlp" else ()
    dropout = float(config.get("dropout", 0.1)) if architecture == "mlp" else 0.0
    activation = config.get("activation", "relu")
    lr = float(config.get("learning_rate", 1e-3))
    weight_decay = float(config.get("weight_decay", 0.01))
    batch_size = int(config.get("batch_size", 512))
    max_epochs = int(config.get("max_epochs", 100))

    input_dim = X_train.shape[1]
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = init_probe_params(init_key, input_dim, hidden_dims)
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    opt_state = tx.init(params)

    n_train = X_train.shape[0]
    n_batches = max(1, (n_train + batch_size - 1) // batch_size)
    # pad train set to a whole number of batches; padded rows get weight 0
    pad = n_batches * batch_size - n_train
    Xt = np.concatenate([X_train, np.zeros((pad, input_dim), X_train.dtype)])
    yt = np.concatenate([np.asarray(y_train, np.float32), np.zeros(pad, np.float32)])
    wt = np.concatenate([np.ones(n_train, np.float32), np.zeros(pad, np.float32)])
    Xt_d, yt_d = jnp.asarray(Xt), jnp.asarray(yt)
    wt_d = jnp.asarray(wt)
    Xv, yv = jnp.asarray(X_val), jnp.asarray(np.asarray(y_val, np.float32))

    def batch_loss(params, xb, yb, wb, rng):
        pred = probe_apply(params, xb, act=activation, dropout=dropout,
                           rng=rng).squeeze(-1)
        # weighted mean == torch MSELoss over the real rows
        return jnp.sum(wb * jnp.square(pred - yb)) / jnp.maximum(jnp.sum(wb), 1.0)

    @jax.jit
    def run_epoch(params, opt_state, rng):
        rng, perm_key = jax.random.split(rng)
        perm = jax.random.permutation(perm_key, n_batches * batch_size)
        Xs = Xt_d[perm].reshape(n_batches, batch_size, input_dim)
        ys = yt_d[perm].reshape(n_batches, batch_size)
        ws = wt_d[perm].reshape(n_batches, batch_size)

        def step(carry, batch):
            params, opt_state, rng = carry
            xb, yb, wb = batch
            rng, drop_key = jax.random.split(rng)
            loss, grads = jax.value_and_grad(batch_loss)(params, xb, yb, wb,
                                                         drop_key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss * jnp.sum(wb)

        (params, opt_state, rng), weighted = jax.lax.scan(
            step, (params, opt_state, rng), (Xs, ys, ws))
        train_loss = jnp.sum(weighted) / n_train

        val_pred = probe_apply(params, Xv, act=activation).squeeze(-1)
        val_loss = jnp.mean(jnp.square(val_pred - yv))
        return params, opt_state, rng, train_loss, val_loss

    train_losses, val_losses = [], []
    best_val, best_params, best_epoch = float("inf"), params, 0
    for epoch in range(max_epochs):
        params, opt_state, key, tl, vl = run_epoch(params, opt_state, key)
        tl, vl = float(tl), float(vl)
        train_losses.append(tl)
        val_losses.append(vl)
        if vl < best_val:
            best_val, best_epoch = vl, epoch
            best_params = jax.device_get(params)
        if verbose and epoch % 100 == 0:
            print(f"Epoch {epoch}: Train Loss = {tl:.4f}, Val Loss = {vl:.4f}")

    return ProbeResult(
        params=jax.tree_util.tree_map(np.asarray, best_params),
        train_losses=train_losses,
        val_losses=val_losses,
        best_epoch=best_epoch,
        best_val_loss=best_val,
        architecture=architecture,
        hidden_dims=hidden_dims,
        activation=activation,
    )
