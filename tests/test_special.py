"""Driver-side special functions (functions/special.py): p-values without
scipy, pinned against published distribution values."""

import pytest

from dataprofiler_spark.functions.special import (betainc, chi2_sf,
                                                  gammainc_lower, t_sf)


def test_gammainc_known_values():
    import math
    assert gammainc_lower(1.0, 1.0) == pytest.approx(1 - math.exp(-1), rel=1e-12)
    assert gammainc_lower(0.5, 0.5) == pytest.approx(0.6826894921, rel=1e-9)
    assert gammainc_lower(3.0, 0.0) == 0.0


def test_chi2_sf_critical_values():
    # textbook 5% critical values
    assert chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(18.307038053275146, 10) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(0.0, 5) == pytest.approx(1.0)


def test_t_sf_symmetry_and_critical():
    assert t_sf(0.0, 7) == pytest.approx(0.5)
    assert t_sf(2.0, 7) + t_sf(-2.0, 7) == pytest.approx(1.0, rel=1e-12)
    # t 5% two-sided critical value at dof=10 is 2.228138852
    assert 2 * t_sf(2.2281388519649385, 10) == pytest.approx(0.05, rel=1e-9)


def test_betainc_bounds():
    assert betainc(2.0, 3.0, 0.0) == 0.0
    assert betainc(2.0, 3.0, 1.0) == 1.0
    # I_0.5(2,2) = 0.5 by symmetry
    assert betainc(2.0, 2.0, 0.5) == pytest.approx(0.5, rel=1e-12)


def test_p_values_wired_into_drift():
    from dataprofiler_spark.operators.drift import (p_value_chi2,
                                                    p_value_welch)
    assert p_value_chi2(3.841458820694124, 1) == pytest.approx(0.05, rel=1e-6)
    assert p_value_welch(2.2281388519649385, 10) == pytest.approx(0.05, rel=1e-6)
