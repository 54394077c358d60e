"""FFT-size helpers for the NCC correlation kernel.

Linear correlation via circular FFT needs a transform length of at least
``image + template - 1`` per axis; we round up to a TPU-friendly small-radix
size (2^a * 3^b * 5^c, biased toward powers of two) so XLA's TPU FFT stays on
its fast path.
"""

from __future__ import annotations


def next_fast_fft_size(n: int) -> int:
    """Smallest size >= n of the form 2^a * 3^b * 5^c with a >= 2.

    Powers of two are preferred by the TPU FFT; allowing a single factor of
    3 or 5 (e.g. 96, 160, 192) avoids the worst padding blowups between
    powers of two.
    """
    if n <= 4:
        return 4
    best = 1
    while best < n:
        best *= 2
    # candidates: pow2, 3*2^k, 5*2^k, 9*2^k, 15*2^k (all >= n, < best*? )
    cands = [best]
    for mult in (3, 5, 9, 15):
        k = 4
        while mult * k < n:
            k *= 2
        cands.append(mult * k)
    return min(c for c in cands if c >= n)


def correlation_fft_shape(image_hw: tuple[int, int], template_hw: tuple[int, int]) -> tuple[int, int]:
    """FFT canvas for alias-free linear correlation of the given canvases."""
    return (
        next_fast_fft_size(image_hw[0] + template_hw[0] - 1),
        next_fast_fft_size(image_hw[1] + template_hw[1] - 1),
    )
