"""DuckDB SQL generators for small dense linear algebra inside oracles.

Several operators end in a driver-side solve of a model-sized SPD
system (ridge normal equations, Hotelling's pooled scatter, Mahalanobis
Σ⁻¹, IRLS Newton steps). Their Spark implementations keep the data pass
distributed and the O(d²) solve on the driver; their DuckDB oracles
need the SAME algebra expressed in SQL so the driver's hash-equality
gate can certify values, not just row counts.

The generators here emit a single-recursion CTE fragment that runs a
Cholesky factorization (d column steps), a forward substitution (d row
steps) and a back substitution (d row steps) over DOUBLE[][] state —
3·d single-row recursion steps total, each O(d·m) work, so a 64×64
solve with 64 right-hand sides is ~10⁶ scalar ops: trivial for DuckDB,
and deterministic. numpy's LU-with-pivoting and this Cholesky agree to
~1e-13 relative on the well-conditioned (ridge-regularized) systems the
operators build, which the operators' output rounding grids absorb —
the same argument the recursive-GD oracles (ml.py DUCK_LOGREG_GD) rely
on for summation-order float drift.

Conventions: the caller supplies CTEs ``mat`` (one row, column ``a`` =
DOUBLE[][] d×d, row-major, 1-indexed) and ``rhs`` (one row, column
``b`` = DOUBLE[][] m×d: m right-hand-side vectors). The fragment
defines CTE ``{out}`` with one row, column ``x`` = DOUBLE[][] m×d of
solutions to A·xᵀ = bᵀ.
"""

from __future__ import annotations


def duck_spd_solve(
    d: int,
    m: int = 1,
    mat: str = "mat",
    rhs: str = "rhs",
    out: str = "sol",
    tag: str = "ls",
) -> str:
    """CTE fragment (for a WITH RECURSIVE list) solving the SPD system.

    Steps 1..d run the Cholesky column recurrence, d+1..2d forward-
    substitute L·y = b for every RHS, 2d+1..3d back-substitute Lᵀ·x = y.
    Phase selection is by step counter so the whole solve is ONE
    recursive CTE; out-of-phase expressions index lists out of range,
    which DuckDB yields as NULL inside the unchosen CASE branch."""
    dp, d2, d3 = d + 1, 2 * d, 3 * d
    zeros = (
        f"list_transform(range(1, {dp}), i -> "
        f"list_transform(range(1, {dp}), j -> CAST(0.0 AS DOUBLE)))"
    )
    # column index during the Cholesky phase
    jc = "(s.step + 1)"
    dot_jj = (
        f"COALESCE(list_aggregate(list_transform(range(1, {jc}), "
        f"k -> s.lm[{jc}][k] * s.lm[{jc}][k]), 'sum'), 0.0)"
    )
    new_l = f"""list_transform(range(1, {dp}), i ->
        list_transform(range(1, {dp}), j ->
          CASE WHEN j <> {jc} OR i < j THEN s.lm[i][j]
               WHEN i = j THEN lat.ljj
               ELSE (m.a[i][{jc}]
                     - COALESCE(list_aggregate(list_transform(
                         range(1, {jc}), k -> s.lm[i][k] * s.lm[{jc}][k]),
                         'sum'), 0.0)) / lat.ljj
          END))"""
    ic = f"(s.step + 1 - {d})"
    new_y = f"""list_transform(range(1, {m + 1}), r ->
        list_transform(range(1, {dp}), i ->
          CASE WHEN i <> {ic} THEN s.yy[r][i]
               ELSE (s.yy[r][i]
                     - COALESCE(list_aggregate(list_transform(
                         range(1, {ic}), k -> s.lm[i][k] * s.yy[r][k]),
                         'sum'), 0.0)) / s.lm[i][i]
          END))"""
    ib = f"({d3} - s.step)"
    new_x = f"""list_transform(range(1, {m + 1}), r ->
        list_transform(range(1, {dp}), i ->
          CASE WHEN i <> {ib} THEN s.xx[r][i]
               ELSE (s.yy[r][i]
                     - COALESCE(list_aggregate(list_transform(
                         range({ib} + 1, {dp}), k -> s.lm[k][i] * s.xx[r][k]),
                         'sum'), 0.0)) / s.lm[i][i]
          END))"""
    return f"""{tag} AS (
      SELECT 0 AS step, {zeros} AS lm, r0.b AS yy, r0.b AS xx
      FROM {rhs} r0
      UNION ALL
      SELECT s.step + 1,
             CASE WHEN s.step < {d} THEN {new_l} ELSE s.lm END,
             CASE WHEN s.step >= {d} AND s.step < {d2} THEN {new_y}
                  ELSE s.yy END,
             CASE WHEN s.step >= {d2} THEN {new_x} ELSE s.xx END
      FROM {tag} s CROSS JOIN {mat} m
      CROSS JOIN LATERAL (
        SELECT SQRT(m.a[{jc}][{jc}] - {dot_jj}) AS ljj) lat
      WHERE s.step < {d3}
    ),
    {out} AS (SELECT xx AS x FROM {tag} WHERE step = {d3})"""


def duck_emb_cov_inverse(ridge: float, d: int = 64) -> str:
    """CTE fragment (for a WITH RECURSIVE list): the inverse of the
    embedding sample covariance + ridge·I, as CTE ``sol`` (one row,
    x DOUBLE[][]; symmetric, so rows = columns). Also defines the
    duck_emb_scatter CTEs (ex/enn/emu/sc) for reuse in the caller's
    per-row scoring."""
    dp = d + 1
    return f"""{duck_emb_scatter(d)},
    mat AS (SELECT list_transform(range(1, {dp}), i ->
              list_transform(range(1, {dp}), j ->
                sc.s[i][j] / (nx.n - 1)
                + CASE WHEN i = j THEN {ridge!r} ELSE 0.0 END)) AS a
            FROM sc CROSS JOIN enn nx),
    rhs AS (SELECT list_transform(range(1, {dp}), r ->
              list_transform(range(1, {dp}), i ->
                CASE WHEN i = r THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END)) AS b),
    {duck_spd_solve(d, d)}"""


def duck_emb_scatter(d: int = 64, tag: str = "sc") -> str:
    """CTE fragment computing the embedding corpus' mean and scatter.

    Defines ``ex`` (vec_id, v DOUBLE[]), ``enn`` (n DOUBLE), ``emu``
    (mu DOUBLE[]) and ``{tag}`` (one row, s DOUBLE[][] = the centered
    scatter Σ(x−μ)(x−μ)ᵀ as ss − n·μμᵀ). Divide by (n−1) for the
    sample covariance — callers scale as their operator does."""
    dp = d + 1
    return f"""ex AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
    enn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ex),
    emu AS (SELECT list(s ORDER BY dim) AS mu FROM (
        SELECT u.dim AS dim, SUM(e.v[u.dim]) / MAX(nx.n) AS s
        FROM ex e CROSS JOIN enn nx
        CROSS JOIN LATERAL (SELECT unnest(range(1, {dp})) AS dim) u
        GROUP BY u.dim) q),
    {tag}_ss AS (SELECT p.i AS i, p.j AS j, SUM(e.v[p.i] * e.v[p.j]) AS ss
        FROM ex e
        CROSS JOIN LATERAL (
          SELECT i.i AS i, j.j AS j
          FROM (SELECT unnest(range(1, {dp})) AS i) i,
               (SELECT unnest(range(1, {dp})) AS j) j) p
        GROUP BY p.i, p.j),
    {tag} AS (SELECT list(row ORDER BY i) AS s FROM (
        SELECT q.i AS i, list(q.ss - nx.n * mx.mu[q.i] * mx.mu[q.j]
                              ORDER BY q.j) AS row
        FROM {tag}_ss q CROSS JOIN enn nx CROSS JOIN emu mx
        GROUP BY q.i) g)"""
