#!/usr/bin/env python3
"""Round-over-round bench comparison with contention awareness.

Usage: python3 tools/bench_diff.py BENCH_rA.json BENCH_rB.json [--top N]

Reads two bench records (the one-line JSON the driver captures, possibly
with an [info] prefix), prints per-family subtotals and the largest
per-query regressions/improvements on the common query set — and flags
any number whose window was contended (steal/stall gate fired or listed
in the `contended` map), since rounds 4-8 showed those numbers track host
noise, not plans. A regression whose window is flagged is reported as
SUSPECT rather than real.
"""
import json
import sys


def load(path):
    """Accepts either raw Bench stdout (one 'total' + one 'total_compact'
    metric line) or the driver's BENCH_rN.json wrapper, whose `parsed`
    field holds only the compact line (per-query map truncated in `tail`
    — per-query diffs then degrade to family subtotals)."""
    full = compact = None
    text = open(path).read()
    if text.lstrip().startswith('{') and '"parsed"' in text:
        d = json.loads(text)
        p = d.get('parsed') or {}
        if p.get('metric') == 'total_compact':
            compact = p
        else:
            full = p
        return full or {'queries': {}}, compact or {}
    for line in text.splitlines():
        if '"metric"' not in line:
            continue
        d = json.loads(line[line.index('{'):])
        if d.get('metric') == 'total':
            full = d
        elif d.get('metric') == 'total_compact':
            compact = d
    if full is None:
        sys.exit(f'{path}: no metric line found')
    return full, compact or {}


def main():
    argv = sys.argv[1:]
    top = 10
    if '--top' in argv:
        i = argv.index('--top')
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    a_path, b_path = argv
    (a, ac), (b, bc) = load(a_path), load(b_path)
    qa, qb = a.get('queries', {}), b.get('queries', {})
    common = sorted(set(qa) & set(qb))
    sa = {**a.get('steal_pct', {}), **a.get('stall_pct', {})}
    sb = {**b.get('steal_pct', {}), **b.get('stall_pct', {})}
    contended = set(ac.get('contended', []) if isinstance(
        ac.get('contended'), list) else ac.get('contended', {})) | set(
        bc.get('contended', []) if isinstance(
            bc.get('contended'), list) else bc.get('contended', {}))

    if common:
        ta = sum(qa[q] for q in common)
        tb = sum(qb[q] for q in common)
        print(f'common queries: {len(common)}  '
              f'{a_path}: {ta:.1f}s  {b_path}: {tb:.1f}s  '
              f'ratio {tb / ta:.2f}x')
    else:
        va = a.get('value') or ac.get('value')
        vb = b.get('value') or bc.get('value')
        print(f'no common per-query map (driver wrapper holds only the '
              f'compact line); totals: {va}s -> {vb}s')
    fam_a, fam_b = ac.get('families', {}), bc.get('families', {})
    for fam in sorted(set(fam_a) | set(fam_b)):
        va, vb = fam_a.get(fam), fam_b.get(fam)
        if va and vb:
            print(f'  family {fam:<10} {va:7.2f}s -> {vb:7.2f}s '
                  f'({vb / va:5.2f}x)')

    def flag(q):
        marks = []
        if q in contended:
            marks.append('CONTENDED')
        if sa.get(q, 0) > 3 or sb.get(q, 0) > 3:
            marks.append(f'noisy({sa.get(q, 0)}/{sb.get(q, 0)}%)')
        return ' '.join(marks)

    deltas = sorted(common, key=lambda q: qb[q] - qa[q])
    print(f'\ntop {top} regressions (B slower):')
    for q in deltas[-top:][::-1]:
        d = qb[q] - qa[q]
        if d <= 0:
            break
        mark = flag(q)
        verdict = 'SUSPECT' if mark else ('real?' if d > 0.5 else 'noise')
        print(f'  {q:<34} {qa[q]:6.2f}s -> {qb[q]:6.2f}s  '
              f'+{d:5.2f}s  {verdict} {mark}')
    print(f'\ntop {top} improvements:')
    for q in deltas[:top]:
        d = qb[q] - qa[q]
        if d >= 0:
            break
        print(f'  {q:<34} {qa[q]:6.2f}s -> {qb[q]:6.2f}s  {d:5.2f}s')


if __name__ == '__main__':
    main()
