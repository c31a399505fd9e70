"""Built-in algorithmic holiday calendars vs hand-checked public dates.

Rule-based: one-off proclamations (e.g. UK 2022 Platinum Jubilee moves) are
out of scope, matching the documented variant in ops/holiday.py."""

import datetime as dt

import pytest

from pytimetk_ray.ops.holiday import (
    ca_holidays,
    de_holidays,
    easter,
    fr_holidays,
    uk_holidays,
    us_federal_holidays,
)


@pytest.mark.parametrize("year,month,day", [
    (2016, 3, 27), (2020, 4, 12), (2021, 4, 4), (2022, 4, 17),
    (2023, 4, 9), (2024, 3, 31), (2025, 4, 20), (2026, 4, 5),
    (2038, 4, 25),  # latest possible Gregorian Easter
    (2285, 3, 22),  # earliest possible
])
def test_easter_known_dates(year, month, day):
    assert easter(year) == dt.date(year, month, day)


def test_uk_2024():
    cal = uk_holidays(2024)
    want = {
        dt.date(2024, 1, 1): "New Year's Day",
        dt.date(2024, 3, 29): "Good Friday",
        dt.date(2024, 4, 1): "Easter Monday",
        dt.date(2024, 5, 6): "Early May Bank Holiday",
        dt.date(2024, 5, 27): "Spring Bank Holiday",
        dt.date(2024, 8, 26): "Summer Bank Holiday",
        dt.date(2024, 12, 25): "Christmas Day",
        dt.date(2024, 12, 26): "Boxing Day",
    }
    assert cal == want


def test_uk_substitute_days():
    # 2021: Christmas Sat -> substitutes Mon 27 + Tue 28
    cal = uk_holidays(2021)
    assert dt.date(2021, 12, 27) in cal and dt.date(2021, 12, 28) in cal
    assert dt.date(2021, 12, 25) not in cal
    # 2022: New Year's Day Sat -> observed Mon Jan 3
    cal22 = uk_holidays(2022)
    assert cal22[dt.date(2022, 1, 3)] == "New Year's Day"
    # 2022: Christmas Sun -> Boxing Mon 26 + Christmas substitute Tue 27
    assert dt.date(2022, 12, 26) in cal22 and dt.date(2022, 12, 27) in cal22
    # 2020: Boxing Day Sat -> substitute Mon 28, Christmas Fri stays
    cal20 = uk_holidays(2020)
    assert cal20[dt.date(2020, 12, 25)] == "Christmas Day"
    assert dt.date(2020, 12, 28) in cal20


def test_de_2024_2025():
    cal = de_holidays(2024)
    assert cal[dt.date(2024, 3, 29)] == "Karfreitag"
    assert cal[dt.date(2024, 5, 9)] == "Christi Himmelfahrt"
    assert cal[dt.date(2024, 5, 20)] == "Pfingstmontag"
    assert dt.date(2024, 10, 3) in cal and len(cal) == 9
    cal25 = de_holidays(2025)
    assert cal25[dt.date(2025, 5, 29)] == "Christi Himmelfahrt"
    assert cal25[dt.date(2025, 6, 9)] == "Pfingstmontag"


def test_fr_2024():
    cal = fr_holidays(2024)
    assert cal[dt.date(2024, 4, 1)] == "Lundi de Paques"
    assert cal[dt.date(2024, 5, 8)] == "Fete de la Victoire"
    assert cal[dt.date(2024, 7, 14)] == "Fete nationale"
    assert len(cal) == 11


def test_ca_2024():
    cal = ca_holidays(2024)
    assert cal[dt.date(2024, 5, 20)] == "Victoria Day"
    assert cal[dt.date(2024, 10, 14)] == "Thanksgiving"
    assert cal[dt.date(2024, 9, 2)] == "Labour Day"
    # Victoria Day when May 24 IS a Monday (2021): May 24
    assert ca_holidays(2021)[dt.date(2021, 5, 24)] == "Victoria Day"


def test_us_unchanged():
    cal = us_federal_holidays(2024)
    assert cal[dt.date(2024, 1, 15)] == "Martin Luther King Jr. Day"
    assert cal[dt.date(2024, 11, 28)] == "Thanksgiving"


def test_tagger_external_package_path(monkeypatch):
    """The optional 'holidays'-package branch: exercised with a fake module
    when the real package is absent (the sandbox case), for real otherwise.
    Also pins the builtin fallback's NotImplementedError for unknown codes."""
    import sys
    import types

    import numpy as np
    import pandas as pd

    from pytimetk_ray.ops.holiday import HolidayTagger

    try:
        import holidays  # noqa: F401

        have_pkg = True
    except ImportError:
        have_pkg = False

    if not have_pkg:
        # unknown country + no package -> builtin fallback refuses loudly
        import pytest

        with pytest.raises(NotImplementedError, match="built-in calendar"):
            # KR became a builtin in round 5; XX stays unknown
            HolidayTagger("ts", country="XX", years=range(2024, 2025))
        # fake module: any country code the package would support
        fake = types.ModuleType("holidays")

        def country_holidays(country, years):
            assert country == "KR"
            return {dt.date(y, 3, 1): "Independence Movement Day"
                    for y in years}

        fake.country_holidays = country_holidays
        monkeypatch.setitem(sys.modules, "holidays", fake)

    tagger = HolidayTagger("ts", country="KR", years=range(2024, 2026))
    batch = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-03-01", "2024-02-29", "2024-03-02", "2024-06-01"])})
    out = tagger(batch)
    assert out["is_holiday"].tolist()[0] == 1
    assert out["before_holiday"].tolist()[1] == 1
    assert out["after_holiday"].tolist()[2] == 1
    if not have_pkg:
        assert out["holiday_name"].tolist()[0] == "Independence Movement Day"
        assert np.all(out["is_holiday"].to_numpy() == [1, 0, 0, 0])


def test_au_2024_and_substitutes():
    from pytimetk_ray.ops.holiday import au_holidays

    cal = au_holidays(2024)
    assert cal[dt.date(2024, 1, 1)] == "New Year's Day"
    assert cal[dt.date(2024, 1, 26)] == "Australia Day"   # Friday, no move
    assert cal[dt.date(2024, 3, 29)] == "Good Friday"
    assert cal[dt.date(2024, 4, 1)] == "Easter Monday"
    assert cal[dt.date(2024, 4, 25)] == "Anzac Day"
    assert cal[dt.date(2024, 12, 25)] == "Christmas Day"
    assert cal[dt.date(2024, 12, 26)] == "Boxing Day"
    # 2022: Jan 1 Sat -> additional Mon Jan 3; Dec 25 Sun -> Tue 27 added
    cal22 = au_holidays(2022)
    assert dt.date(2022, 1, 3) in cal22
    assert dt.date(2022, 1, 1) in cal22          # actual day stays listed
    assert dt.date(2022, 12, 27) in cal22
    # 2021: Jan 26 Tue (no move); Christmas Sat -> Mon 27 + Tue 28 added
    cal21 = au_holidays(2021)
    assert cal21[dt.date(2021, 1, 26)] == "Australia Day"
    assert dt.date(2021, 12, 27) in cal21 and dt.date(2021, 12, 28) in cal21


def test_es_it_2025_fixed_and_easter():
    from pytimetk_ray.ops.holiday import es_holidays, it_holidays

    es = es_holidays(2025)
    assert es[dt.date(2025, 1, 6)] == "Epifania del Senor"
    assert es[dt.date(2025, 4, 18)] == "Viernes Santo"    # Easter 2025-04-20
    assert es[dt.date(2025, 10, 12)] == "Fiesta Nacional de Espana"
    assert es[dt.date(2025, 12, 6)] == "Dia de la Constitucion"
    assert len(es) == 10
    it = it_holidays(2025)
    assert it[dt.date(2025, 4, 21)] == "Lunedi dell'Angelo"
    assert it[dt.date(2025, 6, 2)] == "Festa della Repubblica"
    assert it[dt.date(2025, 12, 26)] == "Santo Stefano"
    assert len(it) == 11


def test_nl_koningsdag_sunday_rule():
    from pytimetk_ray.ops.holiday import nl_holidays

    # 2025: Apr 27 is a Sunday -> Koningsdag observed Sat Apr 26
    nl25 = nl_holidays(2025)
    assert nl25[dt.date(2025, 4, 26)] == "Koningsdag"
    assert dt.date(2025, 4, 27) not in nl25
    # 2024: Apr 27 Saturday -> stays
    nl24 = nl_holidays(2024)
    assert nl24[dt.date(2024, 4, 27)] == "Koningsdag"
    assert nl24[dt.date(2024, 5, 9)] == "Hemelvaartsdag"   # Easter+39
    assert nl24[dt.date(2024, 5, 20)] == "Tweede Pinksterdag"


def test_jp_furikae_substitutes_2024_2025():
    from pytimetk_ray.ops.holiday import jp_holidays

    jp24 = jp_holidays(2024)
    # official 2024 furikae days: Feb 12, May 6, Aug 12, Sep 23, Nov 4
    assert jp24[dt.date(2024, 2, 12)] == "National Foundation Day (observed)"
    assert jp24[dt.date(2024, 5, 6)] == "Children's Day (observed)"
    assert jp24[dt.date(2024, 8, 12)] == "Mountain Day (observed)"
    assert jp24[dt.date(2024, 9, 23)] == "Autumnal Equinox Day (observed)"
    assert jp24[dt.date(2024, 11, 4)] == "Culture Day (observed)"
    assert jp24[dt.date(2024, 3, 20)] == "Vernal Equinox Day"
    assert jp24[dt.date(2024, 9, 22)] == "Autumnal Equinox Day"
    jp25 = jp_holidays(2025)
    # May 4 (Greenery) falls on Sunday; May 5 is Children's Day so the
    # substitute skips to Tue May 6 — the chained-furikae case
    assert jp25[dt.date(2025, 5, 6)] == "Greenery Day (observed)"
    assert jp25[dt.date(2025, 2, 24)] == "Emperor's Birthday (observed)"
    assert jp25[dt.date(2025, 11, 24)] == "Labor Thanksgiving Day (observed)"
    assert jp25[dt.date(2025, 9, 23)] == "Autumnal Equinox Day"
    assert dt.date(2025, 9, 22) not in jp25


def test_jp_citizens_holiday_silver_week_2026():
    from pytimetk_ray.ops.holiday import jp_holidays

    # 2026: Respect for the Aged Mon Sep 21, Autumnal Equinox Wed Sep 23
    # -> Tue Sep 22 is a kokumin no kyujitsu bridge
    jp26 = jp_holidays(2026)
    assert jp26[dt.date(2026, 9, 21)] == "Respect for the Aged Day"
    assert jp26[dt.date(2026, 9, 22)] == "Citizens' Holiday"
    assert jp26[dt.date(2026, 9, 23)] == "Autumnal Equinox Day"


def test_mx_monday_rules_and_sexennial():
    from pytimetk_ray.ops.holiday import mx_holidays

    mx24 = mx_holidays(2024)
    assert mx24[dt.date(2024, 2, 5)] == "Dia de la Constitucion"
    assert mx24[dt.date(2024, 3, 18)] == "Natalicio de Benito Juarez"
    assert mx24[dt.date(2024, 11, 18)] == "Revolucion Mexicana"
    assert mx24[dt.date(2024, 10, 1)] == \
        "Transmision del Poder Ejecutivo Federal"
    mx25 = mx_holidays(2025)
    assert mx25[dt.date(2025, 2, 3)] == "Dia de la Constitucion"
    assert not any("Transmision" in v for v in mx25.values())
    # pre-2024 cycle used Dec 1 (2018 inauguration)
    mx18 = mx_holidays(2018)
    assert mx18[dt.date(2018, 12, 1)] == \
        "Transmision del Poder Ejecutivo Federal"


def test_br_in_fixed_dates():
    from pytimetk_ray.ops.holiday import br_holidays, in_holidays

    br24 = br_holidays(2024)
    assert br24[dt.date(2024, 3, 29)] == "Sexta-feira Santa"
    assert dt.date(2024, 11, 20) in br24          # national from 2024
    assert dt.date(2023, 11, 20) not in br_holidays(2023)
    assert br_holidays(2025)[dt.date(2025, 4, 18)] == "Sexta-feira Santa"
    assert in_holidays(2025) == {
        dt.date(2025, 1, 26): "Republic Day",
        dt.date(2025, 8, 15): "Independence Day",
        dt.date(2025, 10, 2): "Gandhi Jayanti",
    }


def test_builtin_registry_entries():
    from pytimetk_ray.ops.holiday import _BUILTIN_CALENDARS

    assert set(_BUILTIN_CALENDARS) == {
        "US", "UK", "GB", "DE", "FR", "CA", "AU", "ES", "IT", "NL",
        "JP", "BR", "IN", "MX", "KR", "CN", "ZA"}


def test_kr_substitute_rules():
    from pytimetk_ray.ops.holiday import kr_holidays

    kr24 = kr_holidays(2024)
    # Children's Day 2024-05-05 is a Sunday -> substitute Monday
    assert kr24[dt.date(2024, 5, 6)] == "Children's Day (substitute)"
    # Independence Movement Day 2025-03-01 is a Saturday -> Monday 03-03
    assert kr_holidays(2025)[dt.date(2025, 3, 3)] == \
        "Independence Movement Day (substitute)"
    # Children's Day substitute predates the 2021 amendment (since 2014)...
    assert dt.date(2019, 5, 6) in kr_holidays(2019)   # 2019-05-05 Sunday
    # ...but Hangeul Day's does not (2021-10-09 was a Saturday, pre-rule
    # holidays only gained substitutes from 2022)
    assert dt.date(2021, 10, 11) not in kr_holidays(2021)
    # Christmas substitute only from 2023 (2022-12-25 was a Sunday)
    assert dt.date(2022, 12, 26) not in kr_holidays(2022)


def test_cn_qingming_and_fixed():
    from pytimetk_ray.ops.holiday import cn_holidays

    cn24 = cn_holidays(2024)
    assert cn24[dt.date(2024, 4, 4)] == "Qingming Festival"
    assert cn_holidays(2025)[dt.date(2025, 4, 4)] == "Qingming Festival"
    assert cn_holidays(2023)[dt.date(2023, 4, 5)] == "Qingming Festival"
    assert {d for d in cn24 if d.month == 10} == {
        dt.date(2024, 10, 1), dt.date(2024, 10, 2), dt.date(2024, 10, 3)}


def test_za_sunday_rule():
    from pytimetk_ray.ops.holiday import za_holidays

    za24 = za_holidays(2024)
    assert za24[dt.date(2024, 6, 17)] == "Youth Day (observed)"  # 06-16 Sun
    assert za24[dt.date(2024, 4, 1)] == "Family Day"
    za25 = za_holidays(2025)
    assert za25[dt.date(2025, 4, 28)] == "Freedom Day (observed)"
    assert dt.date(2025, 6, 17) not in za25  # 2025-06-16 is a Monday
    assert za25[dt.date(2025, 4, 18)] == "Good Friday"


def test_unknown_country_error_is_actionable():
    from pytimetk_ray.ops.holiday import HolidayTagger

    try:
        import holidays  # noqa: F401
        pytest.skip("external holidays package present; fallback unreachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError) as exc:
        HolidayTagger("d", country="XX")
    msg = str(exc.value)
    assert "pip install holidays" in msg and "'KR'" in msg and "'ZA'" in msg
