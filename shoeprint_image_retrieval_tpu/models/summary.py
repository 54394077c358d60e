"""Model inspection helpers (the reference's debug utilities, done safely).

The reference ships ``printmodel`` (torchinfo dump, network.py:16-29) and
``get_output_size`` (shape probe that hardcodes ``.cuda()`` and breaks on
CPU-only hosts, network.py:32-48). These equivalents need no device and no
dummy forward pass: output channels come from the architecture config and
spatial sizes from the exact conv/pool arithmetic the masked layers use.
"""

from __future__ import annotations

from .efficientnet import Features


def output_size(
    features: Features, input_hw: tuple[int, int]
) -> tuple[int, int, int]:
    """(channels, H, W) of the truncated backbone's output for an input size.

    Computed analytically with the same size rule the masked layers apply
    (models/layers.py conv_out_size), so it agrees exactly with
    ``features.apply``'s valid sizes — no device needed (the reference's
    probe requires CUDA, network.py:45).
    """
    import jax

    # shape-only trace of the real apply path: exact, no device work
    shape = jax.eval_shape(
        lambda p, x, v: features.apply(p, x, v),
        jax.eval_shape(lambda k: features.init(k), jax.random.PRNGKey(0)),
        jax.ShapeDtypeStruct((1, 3, int(input_hw[0]), int(input_hw[1])), "float32"),
        jax.ShapeDtypeStruct((1, 2), "int32"),
    )
    maps = shape[0]
    return (maps.shape[1], maps.shape[2], maps.shape[3])


def describe(features: Features) -> str:
    """Per-child summary: index, type, output channels — the ``printmodel``
    analog (reference network.py:16-29) without a forward pass."""
    lines = ["idx  child                 out_channels"]
    for i, (child, ch) in enumerate(zip(features.children, features.out_channels)):
        lines.append(f"{i:<4} {type(child).__name__:<20} {ch}")
    return "\n".join(lines)
