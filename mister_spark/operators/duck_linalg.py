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


def duck_jacobi_eigvals(
    d: int = 64,
    sweeps: int = 8,
    mat: str = "mat",
    out: str = "eig",
    tag: str = "jac",
) -> str:
    """CTE fragment (for a WITH RECURSIVE list): ALL eigenvalues of the
    symmetric d×d matrix in CTE ``{mat}`` (one row, column ``a`` =
    DOUBLE[][]), via the parallel-ordered (round-robin tournament)
    Jacobi eigenvalue iteration. Defines ``{out}`` with one row, column
    ``ev`` = DOUBLE[] of eigenvalues sorted ascending (numpy.eigvalsh's
    order).

    Each recursion step applies one tournament round: d/2 DISJOINT
    Givens rotations (player d fixed, the circle method pairs the rest),
    zeroing d/2 off-diagonal cells at once, so one full sweep over all
    d(d-1)/2 pairs costs d-1 steps instead of d(d-1)/2 — the classic
    parallel Jacobi ordering (Brent & Luk '85). Because the pairs are
    disjoint, the combined similarity transform touches each matrix
    cell through exactly its own and its partner's row/column:
    a'[i][j] = u_i u_j a[i][j] + u_i w_j a[i][m_j] + w_i u_j a[m_i][j]
    + w_i w_j a[m_i][m_j], with (u, w) the per-index rotation weights
    and m the partner map — O(d²) work per step, d×d DOUBLE[][] state
    in a single row. {sweeps} sweeps drive max|offdiag| of a
    well-conditioned 64×64 covariance below 1e-17 (validated vs LAPACK:
    eigenvalues agree to ~3e-16), far inside every caller's rounding
    grid. Jacobi converges to machine precision on symmetric matrices
    regardless of eigenvalue clustering — the reason it can oracle
    spectra of near-isotropic covariances where eigenVECTORS are
    ill-conditioned and stay rows-only.

    DuckDB 1.0 binder caveat: a LATERAL subquery's correlation to the
    recursive table binds only if the outer column appears OUTSIDE a
    lambda body, so every list_transform below carries a no-op
    ``+ 0*s.step``-style term in its range() bound."""
    dp, nm, half = d + 1, d - 1, d // 2 - 1
    total = sweeps * nm
    # 0-indexed round-robin circle method: player nm fixed, in round r
    # (= step mod nm) it plays r; player x plays at offset k=(x-r) mod nm,
    # k<=d/2-1 pairs with (r-k) mod nm, else with (r + nm - k) mod nm.
    prt = f"""list_transform(range(1, {dp} + 0*s.step), i ->
      CASE
        WHEN i - 1 = {nm} THEN (s.step % {nm})
        WHEN i - 1 = (s.step % {nm}) THEN {nm}
        WHEN (((i - 1 - s.step) % {nm}) + {nm}) % {nm} <= {half}
          THEN ((s.step - ((((i - 1 - s.step) % {nm}) + {nm}) % {nm}))
                % {nm} + {nm}) % {nm}
        ELSE (s.step
              + ({nm} - ((((i - 1 - s.step) % {nm}) + {nm}) % {nm}))) % {nm}
      END + 1)"""
    # stable Jacobi angle for i's pair (p=min(i,m), q=max): tau =
    # (a_qq-a_pp)/(2a_pq), t = sign(tau)/(|tau|+sqrt(1+tau^2)); a_pq=0
    # (converged pair) keeps the identity rotation.
    tau = f"""list_transform(range(1, {dp} + 0*s.step + 0*l1.prt[1]), i ->
      CASE WHEN s.a[LEAST(i, l1.prt[i])][GREATEST(i, l1.prt[i])] = 0
           THEN NULL
           ELSE (s.a[GREATEST(i, l1.prt[i])][GREATEST(i, l1.prt[i])]
                 - s.a[LEAST(i, l1.prt[i])][LEAST(i, l1.prt[i])])
                / (2.0 * s.a[LEAST(i, l1.prt[i])][GREATEST(i, l1.prt[i])])
      END)"""
    tt = f"""list_transform(range(1, {dp} + 0*CAST(l2.tau[1] IS NULL AS INT)),
      i ->
      CASE WHEN l2.tau[i] IS NULL THEN 0.0
           ELSE (CASE WHEN l2.tau[i] >= 0 THEN 1.0 ELSE -1.0 END)
                / (ABS(l2.tau[i]) + SQRT(1.0 + l2.tau[i] * l2.tau[i]))
      END)"""
    # per-index rotation weights: u on e_i, w on e_{m_i}; the lower
    # pair index takes -s (column p = c·e_p − s·e_q).
    uw = f"""list_transform(range(1, {dp} + 0*CAST(l3.tt[1] AS INT)
                                      + 0*l1.prt[1]), i ->
          1.0 / SQRT(1.0 + l3.tt[i] * l3.tt[i])) AS cu,
        list_transform(range(1, {dp} + 0*CAST(l3.tt[1] AS INT)
                                      + 0*l1.prt[1]), i ->
          (CASE WHEN i < l1.prt[i] THEN -1.0 ELSE 1.0 END) * l3.tt[i]
          / SQRT(1.0 + l3.tt[i] * l3.tt[i])) AS wv"""
    new_a = f"""list_transform(range(1, {dp} + 0*s.step + 0*l1.prt[1]
                                          + 0*CAST(l4.cu[1] AS INT)), i ->
      list_transform(range(1, {dp}), j ->
        l4.cu[i] * l4.cu[j] * s.a[i][j]
        + l4.cu[i] * l4.wv[j] * s.a[i][l1.prt[j]]
        + l4.wv[i] * l4.cu[j] * s.a[l1.prt[i]][j]
        + l4.wv[i] * l4.wv[j] * s.a[l1.prt[i]][l1.prt[j]]))"""
    return f"""{tag} AS (
      SELECT 0 AS step, m.a AS a FROM {mat} m
      UNION ALL
      SELECT s.step + 1, {new_a}
      FROM {tag} s
      CROSS JOIN LATERAL (SELECT {prt} AS prt) l1
      CROSS JOIN LATERAL (SELECT {tau} AS tau) l2
      CROSS JOIN LATERAL (SELECT {tt} AS tt) l3
      CROSS JOIN LATERAL (SELECT {uw}) l4
      WHERE s.step < {total}
    ),
    {out} AS (SELECT list_sort(list_transform(range(1, {dp}),
                                              i -> a[i][i])) AS ev
              FROM {tag} WHERE step = {total})"""


def duck_emb_cov_eigvals(d: int = 64, sweeps: int = 8) -> str:
    """CTE fragment (for a WITH RECURSIVE list): the full eigenvalue
    spectrum of the embedding sample covariance (no ridge), as CTE
    ``eig`` (one row, ev DOUBLE[] ascending). Composes duck_emb_scatter
    → covariance ``mat`` → duck_jacobi_eigvals."""
    dp = d + 1
    return f"""{duck_emb_scatter(d)},
    mat AS (SELECT list_transform(range(1, {dp}), i ->
              list_transform(range(1, {dp}), j ->
                sc.s[i][j] / (nx.n - 1))) AS a
            FROM sc CROSS JOIN enn nx),
    {duck_jacobi_eigvals(d, sweeps)}"""


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
