"""Parameter sharding rules over the 2-D (data, model) mesh.

The reference's only parallelism is data parallel (SURVEY.md §2.10); the
mesh here is built 2-D so tensor parallelism can be switched on without an
API change.  The natural TP surface in this model family is the CTC head
projection (hidden x 6623-vocab, the one genuinely weight-heavy matmul);
conv bodies stay replicated (they are batch-bound, not weight-bound).

Recipe (the scaling-book pattern): device_put the params with these
shardings, init the optimizer FROM the sharded params (moments inherit the
layout), and jit the step — XLA inserts the ICI collectives.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

# default TP rules: (path substring, PartitionSpec) — first match wins
DEFAULT_TP_RULES = (
    ("head/fc/kernel", P(None, "model")),  # vocab-dim sharded projection
    ("head/fc/bias", P("model")),
)


def param_shardings(params, mesh, rules=DEFAULT_TP_RULES):
    """NamedSharding pytree for `params`: leaves whose '/'-joined path
    matches a rule get that spec (if divisible); everything else
    replicates."""
    replicated = NamedSharding(mesh, P())

    def assign(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        shape = getattr(leaf, "shape", ())
        for needle, spec in rules:
            if needle not in path_str:
                continue
            if len(shape) < len(spec):
                continue
            divisible = all(
                axis is None or shape[dim] % mesh.shape[axis] == 0
                for dim, axis in enumerate(spec)
            )
            if divisible:
                return NamedSharding(mesh, spec)
        return replicated

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh, rules=DEFAULT_TP_RULES):
    """device_put params according to the TP rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)
