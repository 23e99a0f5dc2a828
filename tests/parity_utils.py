"""Helpers for golden-parity tests: torch->jax weight transfer."""

import sys

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp
import numpy as np


def t2j(t):
    # np.array(..., copy=True): jax's CPU backend can ZERO-COPY alias a
    # numpy array, and t.detach().numpy() is itself a view of the torch
    # parameter storage — without the copy, a later torch optimizer step
    # mutates the "jax" weights in place. In the free-running parity A/Bs
    # (torch steps first each iteration) that silently handed the jax side
    # torch's post-step-0 weights, i.e. a permanent one-step head start.
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def linear_from_torch(mod):
    p = {"w": t2j(mod.weight).T}
    if mod.bias is not None:
        p["b"] = t2j(mod.bias)
    return p


def egnn_params_from_torch(model, n_layers: int, inv_sublayers: int, attention: bool):
    """Modern-EGNN weight transfer (egnn/egnn_new.py layout)."""
    blocks = []
    for i in range(n_layers):
        blk = model._modules[f"e_block_{i}"]
        gcls = []
        for j in range(inv_sublayers):
            gcl = blk._modules[f"gcl_{j}"]
            p = {
                "edge_mlp": (
                    linear_from_torch(gcl.edge_mlp[0]),
                    linear_from_torch(gcl.edge_mlp[2]),
                ),
                "node_mlp": (
                    linear_from_torch(gcl.node_mlp[0]),
                    linear_from_torch(gcl.node_mlp[2]),
                ),
            }
            if attention:
                p["att_mlp"] = linear_from_torch(gcl.att_mlp[0])
            gcls.append(p)
        equiv = blk._modules["gcl_equiv"]
        blocks.append(
            {
                "gcls": tuple(gcls),
                "coord_mlp": (
                    linear_from_torch(equiv.coord_mlp[0]),
                    linear_from_torch(equiv.coord_mlp[2]),
                    linear_from_torch(equiv.coord_mlp[4]),
                ),
            }
        )
    return {
        "embedding": linear_from_torch(model.embedding),
        "embedding_out": linear_from_torch(model.embedding_out),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def dynamics_params_from_torch(torch_dynamics, n_layers, inv_sublayers, attention):
    return {
        "egnn": egnn_params_from_torch(
            torch_dynamics.egnn, n_layers, inv_sublayers, attention
        )
    }


def encoder_params_from_torch(torch_encoder, n_layers, inv_sublayers, attention):
    return {
        "egnn": egnn_params_from_torch(
            torch_encoder.egnn, n_layers, inv_sublayers, attention
        ),
        "final_mlp": (
            linear_from_torch(torch_encoder.final_mlp[0]),
            linear_from_torch(torch_encoder.final_mlp[2]),
        ),
    }


def decoder_params_from_torch(torch_decoder, n_layers, inv_sublayers, attention):
    return {
        "egnn": egnn_params_from_torch(
            torch_decoder.egnn, n_layers, inv_sublayers, attention
        )
    }
