"""Deterministic synthetic LimeSurvey export (FIXTURES.md §1.1).

Shared by tests and the registry's pipeline smoke queries. Encodes every
edge case the reference's semantics hinge on: nulls (dropna-subset vs
dropna-all), empty-vs-null strings, grade-whitelist rejects, keep-latest
dup groups including an exact tie, non-ASCII text.
"""

from __future__ import annotations


def make_survey_payload() -> dict:
    def resp(i, **kw):
        base = {
            "id": str(i),
            "submitdate": f"2024-03-{(i % 28) + 1:02d} 10:00:{i % 60:02d}",
            "lastpage": "3",
            "startlanguage": "pt-BR" if i % 3 else "en",
            "startdate": f"2024-03-{(i % 28) + 1:02d} 09:00:00",
            "datestamp": f"2024-03-{(i % 28) + 1:02d} 10:05:{i % 60:02d}",
            "token": f"tok{i:04d}",
            "q01": f"A{(i % 5) + 1}",
            "q03": f"user{i}@example.com",
            "q06": f"ORD-{i:05d}",
            "q12": "web" if i % 2 else "phone",
            "q22": f"RET-{i:05d}",
        }
        base.update(kw)
        return {str(1000 + i): base}

    responses = [resp(i) for i in range(40)]
    # nulls in q03/q01 (dropna-subset hits, lime_survey_nps.py:70)
    responses.append(resp(40, q03=None))
    responses.append(resp(41, q01=None))
    # null in an unrelated column (dropna-all hits, lime_survey_returns.py:58)
    responses.append(resp(42, q12=None))
    # empty-string answers, distinct from null (parity pin, SURVEY.md §7)
    responses.append(resp(43, q01="", q03=""))
    # whitelist rejects: A6, N10 (lime_survey_orders_shipped.py:73)
    responses.append(resp(44, q01="A6"))
    responses.append(resp(45, q01="N10"))
    # keep-latest dup group on q06: differing datestamp
    responses.append(resp(46, q06="ORD-DUP01", datestamp="2024-03-10 10:00:00", q01="A1"))
    responses.append(resp(47, q06="ORD-DUP01", datestamp="2024-03-11 10:00:00", q01="A2"))
    # exact tie on (q06, datestamp) → deterministic tiebreak on id desc
    responses.append(resp(48, q06="ORD-TIE01", datestamp="2024-03-12 10:00:00", q01="A3"))
    responses.append(resp(49, q06="ORD-TIE01", datestamp="2024-03-12 10:00:00", q01="A4"))
    # non-ASCII
    responses.append(resp(50, q03="joão.señor@exämple.com"))
    # null submitdate: returns does NOT project submitdate
    # (lime_survey_returns.py:55) so this row survives its all-column
    # dropna, and its date_sent comes from datestamp
    responses.append(resp(51, submitdate=None))
    return {"responses": responses}
