"""Pure-Python LD oracle used as ground truth in tests.

Independent reimplementation of the math spec distilled from reference
backend/calc_ld.py (documented in SURVEY.md §0): given two sequences of
phased single-allele genotypes (0 = ref, 1 = alt), produce r^2, D', and
the two alt-allele frequencies, all rounded to 4 decimals, with the
reference's monomorphic conventions (D' = int 0 on a zero denominator,
r^2 = int 0 whenever D' == 0).

Mixed-ploidy semantics (chrX/chrY): the reference builds each variant's
genotype list by appending however many alleles each sample has
(ld_area.py:230-235), so the two lists can differ in length.  calc_ld
then zips them — truncating the pair walk to the SHORTER list — while
each variant's allele counts run over its own FULL list, and every
frequency divides by the zip length (calc_ld.py:30-44).  The oracle
replicates exactly that.
"""


def oracle_ld(genotypes_a, genotypes_b):
    n = min(len(genotypes_a), len(genotypes_b))
    assert n > 0

    both_alt = 0
    for a, b in zip(genotypes_a, genotypes_b):
        if a == 1 and b == 1:
            both_alt += 1
    p_ab = both_alt / n

    alt_a = sum(1 for g in genotypes_a if g == 1)
    ref_a = sum(1 for g in genotypes_a if g == 0)
    alt_b = sum(1 for g in genotypes_b if g == 1)
    ref_b = sum(1 for g in genotypes_b if g == 0)
    p_a, q_a = alt_a / n, ref_a / n
    p_b, q_b = alt_b / n, ref_b / n

    d = p_ab - p_a * p_b
    if d >= 0:
        den = min(p_a * q_b, q_a * p_b)
    else:
        den = max(-p_a * p_b, -q_a * q_b)
    if den == 0:
        d_prime = 0
    else:
        d_prime = d / den

    if d_prime != 0:
        r_square = (d ** 2) / (p_a * q_a * p_b * q_b)
    else:
        r_square = 0

    return {
        "r_square": round(r_square, 4),
        "d_prime": round(d_prime, 4),
        "var_1_alt_freq": round(p_a, 4),
        "var_2_alt_freq": round(p_b, 4),
    }
