"""augment_holiday_signature — is_holiday / before / after / holiday_name.

Reference: src/pytimetk/feature_engineering/holiday_signature.py:33-46
(signature) and :268-311 (build a holiday lookup then map;
``before_holiday`` / ``after_holiday`` are +/-1-day shifts of membership).

The reference uses the ``holidays`` package (not in this environment);
built-in algorithmic calendars stand in for seventeen country codes
(US/UK/GB/DE/FR/CA/AU/ES/IT/NL/JP/BR/IN/MX/KR/CN/ZA — fixed dates,
nth-weekday rules, Easter computus, equinox/solar-term approximations,
weekend-substitute rules; KR/CN cover the Gregorian-dated subset, their
lunisolar holidays need year-specific tables and are documented out of
algorithmic scope), and any installed ``holidays`` package is used when
present (import-try) for every other country code.  The calendar is an
ACTOR-POOL state: built once per worker in ``__init__`` (the reference
rebuilds it per call — SURVEY.md §2.2 maps that to actor state)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

import ray.data as rd


def _nth_weekday(year, month, weekday, n) -> dt.date:
    d = dt.date(year, month, 1)
    offset = (weekday - d.weekday()) % 7
    return d + dt.timedelta(days=offset + 7 * (n - 1))


def _last_weekday(year, month, weekday) -> dt.date:
    if month == 12:
        d = dt.date(year, 12, 31)
    else:
        d = dt.date(year, month + 1, 1) - dt.timedelta(days=1)
    return d - dt.timedelta(days=(d.weekday() - weekday) % 7)


def us_federal_holidays(year: int) -> dict[dt.date, str]:
    """Algorithmic US federal holiday calendar (public rules)."""
    return {
        dt.date(year, 1, 1): "New Year's Day",
        _nth_weekday(year, 1, 0, 3): "Martin Luther King Jr. Day",
        _nth_weekday(year, 2, 0, 3): "Washington's Birthday",
        _last_weekday(year, 5, 0): "Memorial Day",
        dt.date(year, 6, 19): "Juneteenth National Independence Day",
        dt.date(year, 7, 4): "Independence Day",
        _nth_weekday(year, 9, 0, 1): "Labor Day",
        _nth_weekday(year, 10, 0, 2): "Columbus Day",
        dt.date(year, 11, 11): "Veterans Day",
        _nth_weekday(year, 11, 3, 4): "Thanksgiving",
        dt.date(year, 12, 25): "Christmas Day",
    }


def easter(year: int) -> dt.date:
    """Gregorian Easter Sunday — Anonymous Gregorian computus (public
    algorithm; e.g. Meeus/Jones/Butcher as published)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    g = (8 * b + 13) // 25
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * l) // 451
    month, day = divmod(h + l - 7 * m + 114, 31)
    return dt.date(year, month, day + 1)


def _next_monday(d: dt.date) -> dt.date:
    return d + dt.timedelta(days=(7 - d.weekday()) % 7 or 7)


def uk_holidays(year: int) -> dict[dt.date, str]:
    """England & Wales bank holidays (public rules, incl. weekend
    substitutes for New Year / Christmas / Boxing Day)."""
    e = easter(year)
    cal = {
        e - dt.timedelta(days=2): "Good Friday",
        e + dt.timedelta(days=1): "Easter Monday",
        _nth_weekday(year, 5, 0, 1): "Early May Bank Holiday",
        _last_weekday(year, 5, 0): "Spring Bank Holiday",
        _last_weekday(year, 8, 0): "Summer Bank Holiday",
    }
    ny = dt.date(year, 1, 1)
    cal[ny if ny.weekday() < 5 else _next_monday(ny)] = "New Year's Day"
    xmas, boxing = dt.date(year, 12, 25), dt.date(year, 12, 26)
    if xmas.weekday() == 5:      # Sat 25 / Sun 26 -> Mon 27 + Tue 28
        cal[dt.date(year, 12, 27)] = "Christmas Day (substitute)"
        cal[dt.date(year, 12, 28)] = "Boxing Day (substitute)"
    elif xmas.weekday() == 6:    # Sun 25 / Mon 26 -> Mon 26 + Tue 27
        cal[boxing] = "Boxing Day"
        cal[dt.date(year, 12, 27)] = "Christmas Day (substitute)"
    elif xmas.weekday() == 4:    # Fri 25 / Sat 26 -> Fri 25 + Mon 28
        cal[xmas] = "Christmas Day"
        cal[dt.date(year, 12, 28)] = "Boxing Day (substitute)"
    else:
        cal[xmas] = "Christmas Day"
        cal[boxing] = "Boxing Day"
    return cal


def de_holidays(year: int) -> dict[dt.date, str]:
    """German NATIONWIDE public holidays (regional ones excluded)."""
    e = easter(year)
    return {
        dt.date(year, 1, 1): "Neujahr",
        e - dt.timedelta(days=2): "Karfreitag",
        e + dt.timedelta(days=1): "Ostermontag",
        dt.date(year, 5, 1): "Erster Mai",
        e + dt.timedelta(days=39): "Christi Himmelfahrt",
        e + dt.timedelta(days=50): "Pfingstmontag",
        dt.date(year, 10, 3): "Tag der Deutschen Einheit",
        dt.date(year, 12, 25): "Erster Weihnachtstag",
        dt.date(year, 12, 26): "Zweiter Weihnachtstag",
    }


def fr_holidays(year: int) -> dict[dt.date, str]:
    """French public holidays (jours feries, metropolitan list)."""
    e = easter(year)
    return {
        dt.date(year, 1, 1): "Jour de l'an",
        e + dt.timedelta(days=1): "Lundi de Paques",
        dt.date(year, 5, 1): "Fete du Travail",
        dt.date(year, 5, 8): "Fete de la Victoire",
        e + dt.timedelta(days=39): "Ascension",
        e + dt.timedelta(days=50): "Lundi de Pentecote",
        dt.date(year, 7, 14): "Fete nationale",
        dt.date(year, 8, 15): "Assomption",
        dt.date(year, 11, 1): "Toussaint",
        dt.date(year, 11, 11): "Armistice 1918",
        dt.date(year, 12, 25): "Noel",
    }


def ca_holidays(year: int) -> dict[dt.date, str]:
    """Canadian federal statutory holidays (public rules; Victoria Day =
    last Monday preceding May 25)."""
    e = easter(year)
    may24 = dt.date(year, 5, 24)
    victoria = may24 - dt.timedelta(days=(may24.weekday() - 0) % 7)
    return {
        dt.date(year, 1, 1): "New Year's Day",
        e - dt.timedelta(days=2): "Good Friday",
        victoria: "Victoria Day",
        dt.date(year, 7, 1): "Canada Day",
        _nth_weekday(year, 9, 0, 1): "Labour Day",
        _nth_weekday(year, 10, 0, 2): "Thanksgiving",
        dt.date(year, 11, 11): "Remembrance Day",
        dt.date(year, 12, 25): "Christmas Day",
        dt.date(year, 12, 26): "Boxing Day",
    }


def au_holidays(year: int) -> dict[dt.date, str]:
    """Australian NATIONAL public holidays (state-specific ones excluded;
    weekend substitutes per the national simplified rule: New Year /
    Australia Day / Christmas / Boxing Day move or add the next weekday)."""
    e = easter(year)
    cal = {
        e - dt.timedelta(days=2): "Good Friday",
        e + dt.timedelta(days=1): "Easter Monday",
        dt.date(year, 4, 25): "Anzac Day",
    }
    ny = dt.date(year, 1, 1)
    cal[ny] = "New Year's Day"
    if ny.weekday() >= 5:
        cal[_next_monday(ny)] = "New Year's Day (additional)"
    aus = dt.date(year, 1, 26)
    cal[aus if aus.weekday() < 5 else _next_monday(aus)] = "Australia Day"
    xmas, boxing = dt.date(year, 12, 25), dt.date(year, 12, 26)
    cal[xmas] = "Christmas Day"
    cal[boxing] = "Boxing Day"
    if xmas.weekday() == 5:      # Sat 25 / Sun 26 -> Mon 27 + Tue 28 added
        cal[dt.date(year, 12, 27)] = "Christmas Day (additional)"
        cal[dt.date(year, 12, 28)] = "Boxing Day (additional)"
    elif xmas.weekday() == 6:    # Sun 25 / Mon 26 -> Tue 27 added
        cal[dt.date(year, 12, 27)] = "Christmas Day (additional)"
    elif xmas.weekday() == 4:    # Fri 25 / Sat 26 -> Mon 28 added
        cal[dt.date(year, 12, 28)] = "Boxing Day (additional)"
    return cal


def es_holidays(year: int) -> dict[dt.date, str]:
    """Spanish NATIONAL public holidays (fiestas nacionales; autonomous-
    community holidays excluded)."""
    e = easter(year)
    return {
        dt.date(year, 1, 1): "Ano Nuevo",
        dt.date(year, 1, 6): "Epifania del Senor",
        e - dt.timedelta(days=2): "Viernes Santo",
        dt.date(year, 5, 1): "Fiesta del Trabajo",
        dt.date(year, 8, 15): "Asuncion de la Virgen",
        dt.date(year, 10, 12): "Fiesta Nacional de Espana",
        dt.date(year, 11, 1): "Todos los Santos",
        dt.date(year, 12, 6): "Dia de la Constitucion",
        dt.date(year, 12, 8): "Inmaculada Concepcion",
        dt.date(year, 12, 25): "Navidad",
    }


def it_holidays(year: int) -> dict[dt.date, str]:
    """Italian national public holidays (giorni festivi)."""
    e = easter(year)
    return {
        dt.date(year, 1, 1): "Capodanno",
        dt.date(year, 1, 6): "Epifania",
        e + dt.timedelta(days=1): "Lunedi dell'Angelo",
        dt.date(year, 4, 25): "Festa della Liberazione",
        dt.date(year, 5, 1): "Festa del Lavoro",
        dt.date(year, 6, 2): "Festa della Repubblica",
        dt.date(year, 8, 15): "Assunzione di Maria",
        dt.date(year, 11, 1): "Ognissanti",
        dt.date(year, 12, 8): "Immacolata Concezione",
        dt.date(year, 12, 25): "Natale",
        dt.date(year, 12, 26): "Santo Stefano",
    }


def nl_holidays(year: int) -> dict[dt.date, str]:
    """Dutch national public holidays; Koningsdag (Apr 27) moves to Apr 26
    when it falls on a Sunday (public rule since 2014)."""
    e = easter(year)
    kd = dt.date(year, 4, 27)
    if kd.weekday() == 6:
        kd = dt.date(year, 4, 26)
    return {
        dt.date(year, 1, 1): "Nieuwjaarsdag",
        e - dt.timedelta(days=2): "Goede Vrijdag",
        e + dt.timedelta(days=1): "Tweede Paasdag",
        kd: "Koningsdag",
        dt.date(year, 5, 5): "Bevrijdingsdag",
        e + dt.timedelta(days=39): "Hemelvaartsdag",
        e + dt.timedelta(days=50): "Tweede Pinksterdag",
        dt.date(year, 12, 25): "Eerste Kerstdag",
        dt.date(year, 12, 26): "Tweede Kerstdag",
    }


def _jp_equinox(year: int, vernal: bool) -> dt.date:
    """Japanese equinox holidays via the published approximation
    (valid 1980-2099): day = floor(D + 0.242194*(y-1980)) - floor((y-1980)/4)
    with D = 20.8431 (vernal, March) / 23.2488 (autumnal, September)."""
    d0 = 20.8431 if vernal else 23.2488
    day = int(d0 + 0.242194 * (year - 1980)) - (year - 1980) // 4
    return dt.date(year, 3 if vernal else 9, day)


def jp_holidays(year: int) -> dict[dt.date, str]:
    """Japanese public holidays (Public Holiday Law rules, post-2020 set:
    Sports Day naming, Feb 23 Emperor's Birthday, Aug 11 Mountain Day),
    with the two statutory extension rules applied: furikae kyujitsu (a
    holiday on Sunday rolls to the next non-holiday weekday) and kokumin
    no kyujitsu (a workday sandwiched between two holidays becomes one —
    the Silver Week bridge).  One-off observances (Olympic-year moves,
    era-transition days) are out of scope."""
    cal = {
        dt.date(year, 1, 1): "New Year's Day",
        _nth_weekday(year, 1, 0, 2): "Coming of Age Day",
        dt.date(year, 2, 11): "National Foundation Day",
        _jp_equinox(year, True): "Vernal Equinox Day",
        dt.date(year, 4, 29): "Showa Day",
        dt.date(year, 5, 3): "Constitution Memorial Day",
        dt.date(year, 5, 4): "Greenery Day",
        dt.date(year, 5, 5): "Children's Day",
        _nth_weekday(year, 7, 0, 3): "Marine Day",
        _nth_weekday(year, 9, 0, 3): "Respect for the Aged Day",
        _jp_equinox(year, False): "Autumnal Equinox Day",
        _nth_weekday(year, 10, 0, 2): "Sports Day",
        dt.date(year, 11, 3): "Culture Day",
        dt.date(year, 11, 23): "Labor Thanksgiving Day",
    }
    if year >= 2020:
        cal[dt.date(year, 2, 23)] = "Emperor's Birthday"
    if year >= 2016:
        cal[dt.date(year, 8, 11)] = "Mountain Day"
    # furikae kyujitsu: Sunday holiday -> next day not already a holiday
    for d in sorted(cal):
        if d.weekday() == 6:
            sub = d + dt.timedelta(days=1)
            while sub in cal:
                sub += dt.timedelta(days=1)
            cal[sub] = cal[d] + " (observed)"
    # kokumin no kyujitsu: single workday between two holidays
    for d in sorted(cal):
        mid = d + dt.timedelta(days=1)
        if mid not in cal and (d + dt.timedelta(days=2)) in cal \
                and mid.weekday() != 6:
            cal[mid] = "Citizens' Holiday"
    return cal


def br_holidays(year: int) -> dict[dt.date, str]:
    """Brazilian NATIONAL statutory holidays (feriados nacionais): the
    eight fixed dates plus Good Friday; Dia da Consciencia Negra is
    national law from 2024.  Carnival and Corpus Christi are customary,
    not statutory — excluded (matches the ``holidays`` package default)."""
    e = easter(year)
    cal = {
        dt.date(year, 1, 1): "Confraternizacao Universal",
        e - dt.timedelta(days=2): "Sexta-feira Santa",
        dt.date(year, 4, 21): "Tiradentes",
        dt.date(year, 5, 1): "Dia do Trabalhador",
        dt.date(year, 9, 7): "Independencia do Brasil",
        dt.date(year, 10, 12): "Nossa Senhora Aparecida",
        dt.date(year, 11, 2): "Finados",
        dt.date(year, 11, 15): "Proclamacao da Republica",
        dt.date(year, 12, 25): "Natal",
    }
    if year >= 2024:
        cal[dt.date(year, 11, 20)] = "Dia Nacional de Zumbi e da "\
            "Consciencia Negra"
    return cal


def in_holidays(year: int) -> dict[dt.date, str]:
    """Indian NATIONAL holidays — the three gazetted nationwide dates.
    Religious festival holidays follow lunar calendars and vary by state
    and by year-specific gazette; they are out of algorithmic scope (the
    optional ``holidays`` package covers them when installed)."""
    return {
        dt.date(year, 1, 26): "Republic Day",
        dt.date(year, 8, 15): "Independence Day",
        dt.date(year, 10, 2): "Gandhi Jayanti",
    }


def mx_holidays(year: int) -> dict[dt.date, str]:
    """Mexican statutory holidays (Ley Federal del Trabajo art. 74):
    fixed dates plus the three Monday-rule holidays; the sexennial
    presidential-transmission day (2024, 2030, ... — Oct 1 from 2024 on,
    Dec 1 for earlier cycles)."""
    cal = {
        dt.date(year, 1, 1): "Ano Nuevo",
        _nth_weekday(year, 2, 0, 1): "Dia de la Constitucion",
        _nth_weekday(year, 3, 0, 3): "Natalicio de Benito Juarez",
        dt.date(year, 5, 1): "Dia del Trabajo",
        dt.date(year, 9, 16): "Dia de la Independencia",
        _nth_weekday(year, 11, 0, 3): "Revolucion Mexicana",
        dt.date(year, 12, 25): "Navidad",
    }
    if year % 6 == 2024 % 6:
        cal[dt.date(year, 10, 1) if year >= 2024 else dt.date(year, 12, 1)
            ] = "Transmision del Poder Ejecutivo Federal"
    return cal


def kr_holidays(year: int) -> dict[dt.date, str]:
    """South Korean public holidays — Gregorian-dated subset.  Seollal,
    Buddha's Birthday and Chuseok follow the Korean lunisolar calendar
    (year-specific conversion tables) and are out of algorithmic scope —
    the optional ``holidays`` package covers them when installed.
    Substitute-Monday rules (weekend -> next working day): Children's Day
    since 2014; the 2021 amendment extends them to Independence Movement
    Day, Liberation Day, National Foundation Day and Hangeul Day."""
    cal = {
        dt.date(year, 1, 1): "New Year's Day",
        dt.date(year, 3, 1): "Independence Movement Day",
        dt.date(year, 5, 5): "Children's Day",
        dt.date(year, 6, 6): "Memorial Day",
        dt.date(year, 8, 15): "Liberation Day",
        dt.date(year, 10, 3): "National Foundation Day",
        dt.date(year, 10, 9): "Hangeul Day",
        dt.date(year, 12, 25): "Christmas Day",
    }
    eligible = {(5, 5): 2014, (3, 1): 2022, (8, 15): 2022, (10, 3): 2022,
                (10, 9): 2022, (12, 25): 2023}
    subs = {}
    for d, name in cal.items():
        since = eligible.get((d.month, d.day))
        if since is not None and year >= since and d.weekday() >= 5:
            subs[_next_monday(d)] = f"{name} (substitute)"
    cal.update(subs)
    return cal


def _qingming(year: int) -> dt.date:
    """Qingming solar term (sun at 15 deg) — public approximation for
    2000-2099: day = floor(0.2422*Y + 4.81) - floor(Y/4), Y = year-2000."""
    y = year - 2000
    return dt.date(year, 4, int(0.2422 * y + 4.81) - y // 4)


def cn_holidays(year: int) -> dict[dt.date, str]:
    """Chinese statutory holidays — fixed/solar-term subset (New Year,
    Qingming, Labour Day, National Day Oct 1-3).  Spring Festival, Dragon
    Boat and Mid-Autumn follow the Chinese lunisolar calendar and the
    State Council's year-specific bridge-day notices — out of algorithmic
    scope (optional ``holidays`` package covers them when installed)."""
    return {
        dt.date(year, 1, 1): "New Year's Day",
        _qingming(year): "Qingming Festival",
        dt.date(year, 5, 1): "Labour Day",
        dt.date(year, 10, 1): "National Day",
        dt.date(year, 10, 2): "National Day",
        dt.date(year, 10, 3): "National Day",
    }


def za_holidays(year: int) -> dict[dt.date, str]:
    """South African public holidays (Public Holidays Act 36 of 1994):
    twelve statutory days incl. Easter-derived Good Friday / Family Day,
    plus the Act's Sunday rule — a holiday falling on a Sunday makes the
    following Monday a holiday too."""
    e = easter(year)
    cal = {
        dt.date(year, 1, 1): "New Year's Day",
        dt.date(year, 3, 21): "Human Rights Day",
        e - dt.timedelta(days=2): "Good Friday",
        e + dt.timedelta(days=1): "Family Day",
        dt.date(year, 4, 27): "Freedom Day",
        dt.date(year, 5, 1): "Workers' Day",
        dt.date(year, 6, 16): "Youth Day",
        dt.date(year, 8, 9): "National Women's Day",
        dt.date(year, 9, 24): "Heritage Day",
        dt.date(year, 12, 16): "Day of Reconciliation",
        dt.date(year, 12, 25): "Christmas Day",
        dt.date(year, 12, 26): "Day of Goodwill",
    }
    subs = {d + dt.timedelta(days=1): f"{name} (observed)"
            for d, name in cal.items() if d.weekday() == 6}
    cal.update(subs)
    return cal


_BUILTIN_CALENDARS = {
    "US": us_federal_holidays,
    "UK": uk_holidays,
    "GB": uk_holidays,
    "DE": de_holidays,
    "FR": fr_holidays,
    "CA": ca_holidays,
    "AU": au_holidays,
    "ES": es_holidays,
    "IT": it_holidays,
    "NL": nl_holidays,
    "JP": jp_holidays,
    "BR": br_holidays,
    "IN": in_holidays,
    "MX": mx_holidays,
    "KR": kr_holidays,
    "CN": cn_holidays,
    "ZA": za_holidays,
}


class HolidayTagger:
    """Actor-pool stage: calendar built once per worker."""

    def __init__(self, date_column: str, country: str = "US",
                 years=range(1990, 2050)):
        self.date_column = date_column
        cal: dict[dt.date, str] = {}
        try:  # optional external package (any country code it supports)
            import holidays as _h

            cal = dict(_h.country_holidays(country, years=list(years)))
        except ImportError:
            fn = _BUILTIN_CALENDARS.get(country.upper())
            if fn is None:
                raise NotImplementedError(
                    f"no built-in calendar for {country!r}: built-ins cover "
                    f"{sorted(set(_BUILTIN_CALENDARS))} (algorithmic rules; "
                    "KR/CN are the Gregorian-dated subset — lunisolar "
                    "holidays need year tables).  Any other code works via "
                    "the optional 'holidays' package: pip install holidays, "
                    "then this same call picks it up automatically"
                )
            for y in years:
                cal.update(fn(y))
        self.dates = pd.DatetimeIndex(sorted(cal)).values.astype("datetime64[D]")
        self.names = np.array([cal[d] for d in sorted(cal)], dtype=object)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        days = batch[self.date_column].to_numpy().astype("datetime64[D]")
        idx = np.searchsorted(self.dates, days)
        idx_c = np.clip(idx, 0, len(self.dates) - 1)
        is_hol = (self.dates[idx_c] == days).astype(np.uint8)
        before = np.isin(days + np.timedelta64(1, "D"), self.dates).astype(np.uint8)
        after = np.isin(days - np.timedelta64(1, "D"), self.dates).astype(np.uint8)
        batch["is_holiday"] = is_hol
        batch["before_holiday"] = before
        batch["after_holiday"] = after
        names = np.where(is_hol == 1, self.names[idx_c], None)
        batch["holiday_name"] = names
        return batch


def augment_holiday_signature(
    ds: rd.Dataset,
    date_column: str,
    *,
    country: str = "US",
    concurrency: int = 4,
) -> rd.Dataset:
    return ds.map_batches(
        HolidayTagger,
        fn_constructor_kwargs=dict(date_column=date_column, country=country),
        batch_format="pandas",
        concurrency=concurrency,
    )
