"""Numpy stats vs golden values precomputed with scipy 1.11 (hard-coded —
scipy is not installed in this environment)."""

import math

import numpy as np
import pytest

from data_profiler_spark.functions import stats


def test_chi2_sf_golden():
    # scipy.stats.chi2.sf(3.84, 1) = 0.050043521248705147
    assert stats.chi2_sf(3.84, 1) == pytest.approx(0.05004352, rel=1e-6)
    # scipy.stats.chi2.sf(10.0, 5) = 0.07523524614651217
    assert stats.chi2_sf(10.0, 5) == pytest.approx(0.07523525, rel=1e-6)
    # scipy.stats.chi2.sf(100.0, 3) = 1.1613705638419171e-21
    assert stats.chi2_sf(100.0, 3) == pytest.approx(1.1613706e-21, rel=1e-5)
    assert stats.chi2_sf(0.0, 4) == pytest.approx(1.0)


def test_chisquare_golden():
    # scipy.stats.chisquare([10, 20, 30], [20, 20, 20]) ->
    # statistic=10.0, pvalue=0.006737946999085467
    stat, p = stats.chisquare([10, 20, 30], [20, 20, 20])
    assert stat == pytest.approx(10.0)
    assert p == pytest.approx(0.00673795, rel=1e-6)


def test_chi2_contingency_golden():
    # scipy.stats.chi2_contingency([[10, 20], [20, 10]], correction=False)
    # -> statistic=6.666666666666667, p=0.009823274507519235, dof=1
    stat, p, dof = stats.chi2_contingency([[10, 20], [20, 10]])
    assert stat == pytest.approx(6.6666667, rel=1e-6)
    assert p == pytest.approx(0.00982327, rel=1e-6)
    assert dof == 1


def test_cramers_v():
    v = stats.cramers_v([[10, 20], [20, 10]])
    # sqrt(6.6667/60/1) = 0.3333
    assert v == pytest.approx(math.sqrt(6.6666667 / 60.0), rel=1e-6)
    assert stats.cramers_v([[5, 5], [5, 5]]) == 0.0


def test_kl_divergence_golden():
    # scipy.stats.entropy([0.5,0.5],[0.25,0.75]) = 0.1438410362258904
    assert stats.kl_divergence([0.5, 0.5], [0.25, 0.75]) == pytest.approx(
        0.14384104, rel=1e-6
    )
    assert stats.kl_divergence([0.5, 0.5], [0.5, 0.5]) == pytest.approx(0.0, abs=1e-12)
    assert stats.kl_divergence([0.5, 0.5], [1.0, 0.0]) == float("inf")
    # un-normalized inputs are normalized, like scipy.stats.entropy
    assert stats.kl_divergence([5, 5], [25, 75]) == pytest.approx(0.14384104, rel=1e-6)


def test_kolmogorov_sf():
    # scipy.special.kolmogorov(1.0) = 0.2699996716773323
    assert stats.kolmogorov_sf(1.0) == pytest.approx(0.26999967, rel=1e-6)
    # scipy.special.kolmogorov(0.5) = 0.9639452436648751
    assert stats.kolmogorov_sf(0.5) == pytest.approx(0.96394524, rel=1e-6)
    assert stats.kolmogorov_sf(0.0) == 1.0


def test_ks_2samp_identical_hists():
    d, p = stats.ks_2samp_from_hist([10, 20, 30], [1, 2, 3], 60, 6)
    assert d == pytest.approx(0.0)
    assert p == pytest.approx(1.0)


def test_ks_2samp_shifted():
    w1 = [50, 30, 15, 5]
    w2 = [5, 15, 30, 50]
    d, p = stats.ks_2samp_from_hist(w1, w2, 100, 100)
    cdf1 = np.cumsum(w1) / 100
    cdf2 = np.cumsum(w2) / 100
    assert d == pytest.approx(float(np.max(np.abs(cdf1 - cdf2))))
    assert p < 0.001


def test_gammainc_vs_math_erfc():
    # Q(1/2, x) == erfc(sqrt(x)) analytically
    for x in [0.1, 0.5, 1.0, 2.0, 5.0]:
        assert stats.gammainc_upper(0.5, x) == pytest.approx(
            math.erfc(math.sqrt(x)), rel=1e-10
        )


def test_chisquare_inf_stat_p_zero():
    """ADVICE r1 (low): observed>0 where expected==0 -> stat=inf, p must be
    0.0 (scipy), not NaN."""
    from data_profiler_spark.functions.stats import chisquare

    stat, p = chisquare([10, 5, 3], [9, 9, 0])
    assert stat == float("inf")
    assert p == 0.0


def test_erfcc_and_parameterized_cdf():
    # scipy.special.erfc goldens: erfc(0)=1, erfc(1)=0.15729920705028513,
    # erfc(-1)=1.8427007929497149, erfc(2)=0.004677734981063127
    assert stats.erfcc_np(0.0) == pytest.approx(1.0, abs=1.5e-7)
    assert float(stats.erfcc_np(1.0)) == pytest.approx(0.15729921, abs=1.5e-7)
    assert float(stats.erfcc_np(-1.0)) == pytest.approx(1.84270079, abs=1.5e-7)
    assert float(stats.erfcc_np(2.0)) == pytest.approx(0.00467773, abs=1.5e-7)

    # norm cdf via the reference's (mean, std_dev) convention;
    # scipy.stats.norm.cdf(1.96) = 0.9750021048517795
    cdf = stats.parameterized_cdf("norm", {"mean": 0.0, "std_dev": 1.0})
    assert float(cdf(1.96)) == pytest.approx(0.97500210, abs=2e-7)
    # uniform via (min, max-as-scale) positional convention (metrics/util.py:534-535)
    u = stats.parameterized_cdf("uniform", {"min": 1.0, "max": 49.0})
    assert float(u(1.0)) == 0.0 and float(u(50.0)) == 1.0
    assert float(u(25.5)) == pytest.approx(0.5)
    e = stats.parameterized_cdf("expon", {"loc": 0.0, "scale": 2.0})
    assert float(e(2.0)) == pytest.approx(1 - math.exp(-1.0))
    with pytest.raises(ValueError):
        stats.parameterized_cdf("beta", {"alpha": 1, "beta": 1})
    with pytest.raises(ValueError):
        stats.parameterized_cdf("norm", {"mean": 0.0, "std_dev": -1.0})


def test_ks_1samp_p_golden():
    # scipy.stats.kstest(uniform n=1000, d=0.02...) asymp p reference:
    # Q((sqrt(1000)+0.12+0.11/sqrt(1000)) * 0.03) = kolmogorov_sf(0.952...)
    p = stats.ks_1samp_p(0.03, 1000)
    assert 0.2 < p < 0.5  # same regime scipy reports (~0.32 asymp)
    assert stats.ks_1samp_p(0.5, 1000) < 1e-10
    assert stats.ks_1samp_p(0.0, 1000) == pytest.approx(1.0)


def test_parameterized_cdf_rejects_zero_scale():
    """ADVICE r3: an EXPLICIT 0 parameter must hit the positivity check,
    not be silently coerced to the default by `or`."""
    from data_profiler_spark.functions import stats as S

    for dist, params in [
        ("norm", {"mean": 0.0, "std_dev": 0}),
        ("uniform", {"min": 0.0, "max": 0}),
        ("expon", {"loc": 0.0, "scale": 0}),
        ("lognorm", {"s": 0, "loc": 0.0, "scale": 1.0}),
    ]:
        with pytest.raises(ValueError):
            S.parameterized_cdf(dist, params)
    # absent params still default
    cdf = S.parameterized_cdf("norm", {})
    assert float(cdf([0.0])[0]) == pytest.approx(0.5, abs=1e-7)


def test_uniform_scale_alias():
    """uniform's second parameter IS scipy's scale; 'scale' is the honest
    kwarg, 'max' stays as the reference-compatible alias of the SAME value."""
    from data_profiler_spark.functions import stats as S

    cdf_max = S.parameterized_cdf("uniform", {"min": 1.0, "max": 49.0})
    cdf_scale = S.parameterized_cdf("uniform", {"min": 1.0, "scale": 49.0})
    xs = [1.0, 25.0, 50.0]
    assert list(cdf_max(xs)) == list(cdf_scale(xs))
    assert float(cdf_max([50.0])[0]) == 1.0  # spans [1, 50], not [1, 49]
