"""Deliberately-naive single-row reference implementations of the pooling
spec, written as plain Python loops (no vectorization) so the vectorized
kernels in ``tinybrain_spark.kernels`` are checked against an independent
formulation of the same semantics (the reference repo's differential-test
strategy, automated_test.py:128-254)."""

from __future__ import annotations

import math

import numpy as np

_CYCLE4 = 4


def _cycle(window: int, dtype: np.dtype) -> int:
    if window == 8 and np.dtype(dtype).itemsize == 2:
        return 5
    if window == 8:
        return 8
    if window == 4:
        return 4
    return 8


def _pad_cyclic(vals: list, window: int) -> list:
    rem = len(vals) % window
    if rem == 0:
        return list(vals)
    tail = list(vals[len(vals) - rem :])
    out = list(vals)
    i = 0
    while len(out) % window != 0:
        out.append(tail[i % rem])
        i += 1
    return out


def naive_avg(tokens, window, num_tiers, sparse=False, dtype=np.int32):
    dt = np.dtype(dtype)
    is_float = dt.kind == "f"
    vals = [dt.type(v) for v in tokens]

    # tier-0 accumulators of original values
    padded = _pad_cyclic(vals, window)
    accum = []
    denom = []
    for i in range(0, len(padded), window):
        block = padded[i : i + window]
        if is_float:
            s = dt.type(0)  # accumulate in the input float type, like the
            for b in block:  # reference (accumulate_2x2f, pyx:469-599)
                s = dt.type(s + b)
            accum.append(s)
        else:
            accum.append(int(sum(int(b) for b in block)))
        denom.append(sum(1 for b in block if b != 0))

    log2w = int(math.log2(window))
    cycle = _cycle(window, dt)
    results = []
    for m in range(num_tiers):
        shift = log2w * ((m % cycle) + 1)
        tier = []
        for j in range(len(accum)):
            if sparse:
                if denom[j] == 0:
                    tier.append(0)
                elif is_float:
                    tier.append(accum[j] / denom[j])
                else:
                    q = abs(accum[j]) // denom[j]
                    tier.append(-q if accum[j] < 0 else q)
            elif is_float:
                tier.append(accum[j] / float(window) ** (m + 1))
            else:
                q = abs(accum[j]) >> shift
                tier.append(-q if accum[j] < 0 else q)
        results.append(np.array(tier, dtype=dt))
        if m == num_tiers - 1:
            break
        if not is_float and shift == log2w * cycle:
            # shift_right (hpp:979-984) is a raw arithmetic shift (floor
            # for negatives) — unlike render_image's toward-zero rounding
            accum = [a >> shift for a in accum]
            if sparse and window == 8:
                denom = [d >> shift for d in denom]
        if is_float:
            new_accum = []
            for block in _chunks(_pad_cyclic(accum, window), window):
                s = dt.type(0)
                for b in block:
                    s = dt.type(s + b)
                new_accum.append(s)
            accum = new_accum
        else:
            accum = [
                sum(block)
                for block in _chunks(_pad_cyclic(accum, window), window)
            ]
        denom = [
            sum(block)
            for block in _chunks(_pad_cyclic(denom, window), window)
        ]
    return results


def _chunks(vals, window):
    return [vals[i : i + window] for i in range(0, len(vals), window)]


def _mode_window(block, window, sparse):
    if len(block) < window:
        return block[0]
    if window == 2:
        a, b = block
        if sparse:
            return a if a != 0 else b
        return a
    if window == 4:
        a, b, c, d = block
        if not sparse:
            if a == b or a == c:
                return a
            if b == c:
                return b
            return d
        # stippled: zeros are background
        pair = 0
        if a != 0 and (a == b or a == c):
            pair = a
        elif b != 0 and b == c:
            pair = b
        if pair != 0:
            return pair
        if d != 0:
            return d
        for v in (a, b, c):
            if v != 0:
                return v
        return 0
    # window == 8: counting mode, first-occurrence tie-break
    best_val, best_ct = 0, -1
    for t, v in enumerate(block):
        if sparse and v == 0:
            continue
        ct = sum(1 for u in block if u == v)
        if ct > best_ct:
            best_ct, best_val = ct, v
    if best_ct <= 0:
        return 0
    return best_val


def naive_mode(tokens, window, num_tiers, sparse=False):
    cur = [int(v) for v in tokens]
    results = []
    for _ in range(num_tiers):
        nxt = []
        for i in range(0, len(cur), window):
            nxt.append(_mode_window(cur[i : i + window], window, sparse))
        results.append(np.array(nxt, dtype=np.asarray(tokens).dtype))
        cur = nxt
    return results


def naive_reduce(tokens, window, num_tiers, fn):
    cur = list(tokens)
    results = []
    for _ in range(num_tiers):
        padded = _pad_cyclic(cur, window)
        nxt = [fn(padded[i : i + window]) for i in range(0, len(padded), window)]
        results.append(np.array(nxt, dtype=np.asarray(tokens).dtype))
        cur = nxt
    return results


def naive_stride(tokens, window, num_tiers):
    cur = list(tokens)
    results = []
    for _ in range(num_tiers):
        cur = cur[::window]
        results.append(np.array(cur, dtype=np.asarray(tokens).dtype))
    return results
