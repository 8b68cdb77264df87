"""Derivational DuckDB oracles for the mention / analysis query surfaces.

Until round 3 the ``kg_mentions`` and ``kg_analysis_rows`` oracles were
``SELECT * FROM expected_*`` pass-throughs (ground truth owned by the
single-process oracle run).  These builders re-derive both surfaces in SQL
from the RAW inputs — the pages parquet and the registry parquets — so the
driver's gate now cross-checks three independent implementations (Ray
engine, single-process oracle, DuckDB SQL) instead of two.

What is derived structurally from raw pages / registry (no expected table):

* the session-island extraction + activity split  (parsing.py:32-42)
* the M3 procedural-activity filter               (parsing.py:75-80)
* activity mention surfaces (onderwerp-or-titel)  (emit.py:55-62)
* the M4 two-method speaker parse + dedup key     (parsing.py:101-146)
* the F6 zaak parse (dossier+stuk required)       (parsing.py:148-170)
* the J6 agendapunt expansion off the matched
  activity id via activity_cases × cases          (linking.py:801-807,864-872)
* the M6 vote parse + match_fractie name map      (parsing.py:172-193,
                                                   linking.py:810-812)
* topics = titel of each successful zaak match    (emit.py:253-255)
* the §2.9 fragment + sequential interruption
  scan incl. _find_matching_speaker semantics     (emit.py:30-40,144-201)

What is joined FROM the ground-truth tables (link-side values SQL cannot
recompute): per-mention entity_id / match_type / score (the fuzzy cascade),
sha1-based mention_id / event_id, and the per-surface person_id used by the
interruption scan.  The join is a ranked multiset join: both sides get a
``row_number()`` within the full derivable-column tuple, so the oracle
output equals the ground truth EXACTLY when (and only when) the structural
multiset derived from raw pages agrees with it — any divergence drops or
mutates rows and the driver's hash gate goes red.

Corpus-shape assumptions (validated by tools/sweep.py over every cached
corpus): spreker elements always sit inside <sprekers>, text content never
contains XML entities or CDATA, each page carries at most one
<vergadering> island, and the speaker surface trim(voornaam || ' ' ||
achternaam) is injective back to (voornaam, achternaam) within an activity
(voornaam is always a single token in the renderer) — the interruption
pid_map joins ground-truth person links by surface and takes
MIN(entity_id) per (url, activity, surface), which merges links only when
that injectivity holds. All true of corpus.py's renderer by construction.
"""

from __future__ import annotations

_FR = r"'(?s)<draadboekfragment>.*?</draadboekfragment>'"
_SPR = r"'(?s)<spreker>.*?</spreker>'"

# Shared prefix: decode nl pages, locate the session island, split into
# activity blocks, apply the procedural filter (config.py:91-94 defaults).
_PAGES_PREFIX = """
pg AS (
    SELECT url, warc_ts, decode(html) AS txt
    FROM read_parquet('{cd}/pages/*.parquet') WHERE lang = 'nl'
), isl AS (
    SELECT url, warc_ts,
           regexp_extract(txt, '(?s)<vergadering.*?</vergadering>') AS island
    FROM pg
), acts AS (
    SELECT url, warc_ts,
           unnest(regexp_extract_all(island,
               '(?s)<activiteit .*?</activiteit>')) AS ab
    FROM isl WHERE island IS NOT NULL AND island <> ''
), act0 AS (
    SELECT url, warc_ts,
           regexp_extract(ab, '^<activiteit[^>]*objectid="([^"]*)"', 1)
               AS object_id,
           regexp_extract(ab, '^<activiteit[^>]*soort="([^"]*)"', 1) AS soort,
           COALESCE(regexp_extract(ab, '(?s)<titel>(.*?)</titel>', 1), '')
               AS titel,
           COALESCE(regexp_extract(ab, '(?s)<onderwerp>(.*?)</onderwerp>', 1),
                    '') AS onderwerp,
           ab
    FROM acts
), napc AS (
    SELECT * FROM act0
    WHERE lower(soort) NOT IN
          ('opening', 'sluiting', 'aanvang', 'einde vergadering')
      AND NOT contains(lower(titel), 'opening')
      AND NOT contains(lower(titel), 'sluiting')
      AND NOT contains(lower(titel), 'aanvang')
      AND NOT contains(lower(titel), 'einde vergadering')
)"""

# <spreker> field extraction (parsing.py:44-52: verslagnaam overrides
# achternaam; require a last name).
_SPK_FIELDS = """
           COALESCE(regexp_extract(sp,
               '(?s)<voornaam>(.*?)</voornaam>', 1), '') AS voornaam,
           CASE WHEN COALESCE(regexp_extract(sp,
                    '(?s)<verslagnaam>(.*?)</verslagnaam>', 1), '') <> ''
                THEN regexp_extract(sp,
                    '(?s)<verslagnaam>(.*?)</verslagnaam>', 1)
                ELSE COALESCE(regexp_extract(sp,
                    '(?s)<achternaam>(.*?)</achternaam>', 1), '')
           END AS achternaam"""


def mentions_sql(cd: str) -> str:
    """Derivational oracle for the ``kg_mentions`` surface."""
    prefix = _PAGES_PREFIX.format(cd=cd)
    return f"""
WITH {prefix}, m_act AS (
    SELECT url, object_id AS activity_local_id, 'activity' AS kind,
           CASE WHEN onderwerp <> '' THEN onderwerp
                WHEN titel <> '' THEN titel ELSE '' END AS surface
    FROM napc
), spk_raw AS (
    SELECT url, warc_ts, object_id,
           unnest(regexp_extract_all(ab, {_SPR})) AS sp
    FROM napc
), spk AS (
    SELECT url, warc_ts, object_id,{_SPK_FIELDS},
           COALESCE(regexp_extract(sp,
               '(?s)<fractie>(.*?)</fractie>', 1), '') AS fractie
    FROM spk_raw
), m_spk AS (
    -- M4 dedup key voornaam|achternaam|fractie-or-none; methods 1+2 union
    -- to "every spreker element of the activity" because method 2 sweeps
    -- all elements method 1 skipped (parsing.py:101-146)
    SELECT DISTINCT url, warc_ts, object_id AS activity_local_id,
           voornaam, achternaam,
           CASE WHEN fractie = '' THEN 'none' ELSE fractie END AS fr_key
    FROM spk WHERE achternaam <> ''
), zk AS (
    SELECT url, warc_ts, object_id,
           unnest(regexp_extract_all(ab, '(?s)<zaak .*?</zaak>')) AS zb
    FROM napc
), m_zaak_xml AS (
    SELECT url, object_id AS activity_local_id, 'zaak' AS kind,
           trim(COALESCE(regexp_extract(zb,
               '<dossiernummer>(.*?)</dossiernummer>', 1), '')) AS dnr,
           trim(COALESCE(regexp_extract(zb,
               '<stuknummer>(.*?)</stuknummer>', 1), '')) AS stuk
    FROM zk
), m_agenda AS (
    SELECT e.url, e.activity_local_id, 'zaak' AS kind,
           CAST(c.dossiernummer AS VARCHAR) || ':' ||
           CAST(c.stuknummer AS VARCHAR) AS surface
    FROM read_parquet('{cd}/expected_mentions.parquet') e
    JOIN read_parquet('{cd}/activity_cases.parquet') ac
      ON ac.activity_id = e.entity_id
    JOIN read_parquet('{cd}/cases.parquet') c USING (zaak_id)
    WHERE e.kind = 'activity' AND e.entity_id <> ''
), derived AS (
    SELECT url, activity_local_id, kind, surface FROM m_act
    UNION ALL
    SELECT url, activity_local_id, 'speaker',
           trim(voornaam || ' ' || achternaam) FROM m_spk
    UNION ALL
    SELECT url, activity_local_id, kind, dnr || ':' || stuk
    FROM m_zaak_xml WHERE dnr <> '' AND stuk <> ''
    UNION ALL
    SELECT url, activity_local_id, kind, surface FROM m_agenda
), exp_r AS (
    SELECT *, row_number() OVER (
        PARTITION BY url, activity_local_id, kind, surface
        ORDER BY mention_id) AS rnk
    FROM read_parquet('{cd}/expected_mentions.parquet')
), drv_r AS (
    SELECT url, activity_local_id, kind, surface, row_number() OVER (
        PARTITION BY url, activity_local_id, kind, surface) AS rnk
    FROM derived
)
SELECT e.url, e.mention_id, e.kind, e.surface, e.activity_local_id,
       e.entity_id, e.entity_kind, e.match_type, e.score
FROM exp_r e
JOIN drv_r d USING (url, activity_local_id, kind, surface, rnk)
"""


def analysis_sql(cd: str) -> str:
    """Derivational oracle for the ``kg_analysis_rows`` surface."""
    prefix = _PAGES_PREFIX.format(cd=cd)
    return f"""
WITH {prefix},
-- ============================== votes (M6) ==============================
vitem0 AS (
    SELECT url, warc_ts, object_id,
           unnest(regexp_extract_all(ab,
               '(?s)<activiteititem [^>]*>.*?</activiteititem>')) AS ib
    FROM napc
), vitem AS (
    SELECT url, warc_ts, object_id,
           lower(regexp_extract(ib,
               '^<activiteititem[^>]*soort="([^"]*)"', 1)) AS isoort,
           COALESCE(regexp_extract(ib,
               '(?s)<besluitvorm>(.*?)</besluitvorm>', 1), '') AS besluitvorm,
           COALESCE(regexp_extract(ib,
               '(?s)<uitslag>(.*?)</uitslag>', 1), '') AS uitslag,
           COALESCE(regexp_extract(ib,
               '(?s)<stemmingen>(.*?)</stemmingen>', 1), '') AS stemb
    FROM vitem0
), stem AS (
    SELECT url, warc_ts, object_id, besluitvorm, uitslag,
           unnest(regexp_extract_all(stemb,
               '(?s)<stemming>.*?</stemming>')) AS sb
    FROM vitem WHERE isoort IN ('besluit', 'stemming', 'vote')
), fvote AS (
    SELECT url, warc_ts, object_id, besluitvorm, uitslag,
           COALESCE(regexp_extract(sb,
               '(?s)<fractie>(.*?)</fractie>', 1), '') AS fractie_naam,
           COALESCE(regexp_extract(sb,
               '(?s)<stem>(.*?)</stem>', 1), '') AS stem
    FROM stem
), party_keys AS (
    -- match_fractie: party_by_name setdefault over (naam, afkorting) in
    -- table order, naam before afkorting (linking.py:170-173)
    SELECT lower(naam) AS k, fractie_id,
           2 * row_number() OVER (ORDER BY fractie_id) AS prio
    FROM read_parquet('{cd}/parties.parquet')
    UNION ALL
    SELECT lower(afkorting), fractie_id,
           2 * row_number() OVER (ORDER BY fractie_id) + 1
    FROM read_parquet('{cd}/parties.parquet')
), party_map AS (
    SELECT k, fractie_id FROM (
        SELECT k, fractie_id,
               row_number() OVER (PARTITION BY k ORDER BY prio) AS r
        FROM party_keys) WHERE r = 1
), vrow AS (
    SELECT f.url, f.warc_ts, f.object_id,
           COALESCE(pm.fractie_id, '') AS fractie_id,
           f.fractie_naam, lower(f.stem) AS vote, f.uitslag,
           contains(lower(f.besluitvorm), 'hoofdelijk') AS is_hoofdelijk
    FROM fvote f LEFT JOIN party_map pm ON pm.k = lower(f.fractie_naam)
    WHERE f.fractie_naam <> '' AND f.stem <> ''
),
-- ================= topics: titel per successful zaak match ==============
zk AS (
    SELECT url, warc_ts, object_id,
           unnest(regexp_extract_all(ab, '(?s)<zaak .*?</zaak>')) AS zb
    FROM napc
), zkx AS (
    SELECT url, warc_ts, object_id,
           trim(COALESCE(regexp_extract(zb,
               '<dossiernummer>(.*?)</dossiernummer>', 1), '')) AS dnr,
           trim(COALESCE(regexp_extract(zb,
               '<stuknummer>(.*?)</stuknummer>', 1), '')) AS stuk,
           regexp_replace(COALESCE(regexp_extract(zb,
               '(?s)<titel>(.*?)</titel>', 1), ''),
               '^\\s+|\\s+$', '', 'g') AS ztitel
    FROM zk
), xml_topics AS (
    SELECT z.url, z.warc_ts, z.object_id, z.ztitel AS topic
    FROM zkx z
    WHERE z.dnr <> '' AND z.stuk <> ''
      AND EXISTS (SELECT 1
                  FROM read_parquet('{cd}/expected_mentions.parquet') e
                  WHERE e.url = z.url AND e.kind = 'zaak'
                    AND e.activity_local_id = z.object_id
                    AND e.surface = z.dnr || ':' || z.stuk
                    AND e.entity_id <> '')
), act_matched AS (
    SELECT DISTINCT url, activity_local_id, entity_id
    FROM read_parquet('{cd}/expected_mentions.parquet')
    WHERE kind = 'activity' AND entity_id <> ''
), agenda_topics AS (
    SELECT am.url, am.activity_local_id, c.onderwerp AS topic
    FROM act_matched am
    JOIN read_parquet('{cd}/activity_cases.parquet') ac
      ON ac.activity_id = am.entity_id
    JOIN read_parquet('{cd}/cases.parquet') c USING (zaak_id)
), topics AS (
    SELECT url, warc_ts, object_id, topic FROM xml_topics
    UNION ALL
    SELECT n.url, n.warc_ts, n.object_id, a.topic
    FROM napc n JOIN agenda_topics a
      ON a.url = n.url AND a.activity_local_id = n.object_id
),
-- =================== interruption sequence (M4 + §2.9) ==================
frag0 AS (
    SELECT url, warc_ts, object_id,
           unnest(regexp_extract_all(ab, {_FR})) AS fb,
           generate_subscripts(regexp_extract_all(ab, {_FR}), 1) AS fpos
    FROM napc
), frag AS (
    -- fragment_count counts frags WITH a <tekst> child (parsing.py:103-106)
    SELECT url, warc_ts, object_id, fb, fpos,
           row_number() OVER (PARTITION BY url, warc_ts, object_id
                              ORDER BY fpos) AS frag_no,
           regexp_replace(regexp_replace(
               COALESCE(regexp_extract(fb, '(?s)<tekst>(.*?)</tekst>', 1),
                        ''), '<[^>]*>', ' ', 'g'),
               '^\\s+|\\s+$', '', 'g') AS speech
    FROM frag0
    -- regexp_extract returns '' (not NULL) on no match, so the has-a-
    -- <tekst>-child test must compare against '' (a match is never empty:
    -- it includes the tags)
    WHERE COALESCE(regexp_extract(fb, '(?s)<tekst>.*?</tekst>'), '') <> ''
), seqe AS (
    SELECT url, warc_ts, object_id, frag_no,
           unnest(regexp_extract_all(fb, {_SPR})) AS sp,
           generate_subscripts(regexp_extract_all(fb, {_SPR}), 1) AS spos
    FROM frag WHERE speech <> ''
), seq AS (
    SELECT url, warc_ts, object_id, frag_no,{_SPK_FIELDS},
           row_number() OVER (PARTITION BY url, warc_ts, object_id
                              ORDER BY frag_no, spos) AS pos
    FROM seqe
    QUALIFY achternaam <> ''
), all_spk AS (
    SELECT url, warc_ts, object_id,
           unnest(regexp_extract_all(ab, {_SPR})) AS sp,
           generate_subscripts(regexp_extract_all(ab, {_SPR}), 1) AS dpos
    FROM napc
), all_spk_f AS (
    SELECT url, warc_ts, object_id, dpos,{_SPK_FIELDS}
    FROM all_spk
), va AS (
    -- speaker-list append order: method-1 (sequence) first occurrence,
    -- then method-2 (any spreker element, document order)
    SELECT a.url, a.warc_ts, a.object_id, a.voornaam, a.achternaam,
           MIN(s.pos) AS seq_pos, MIN(a.dpos) AS doc_pos
    FROM all_spk_f a
    LEFT JOIN seq s ON s.url = a.url AND s.warc_ts = a.warc_ts
        AND s.object_id = a.object_id AND s.voornaam = a.voornaam
        AND s.achternaam = a.achternaam
    WHERE a.achternaam <> ''
    GROUP BY ALL
), pid_map AS (
    -- the one link-side input: per-surface person_id from ground truth
    SELECT url, activity_local_id, surface, MIN(entity_id) AS pid
    FROM read_parquet('{cd}/expected_mentions.parquet')
    WHERE kind = 'speaker' GROUP BY ALL
), pname AS (
    -- person_name_by_id: (roepnaam or voornamen) + achternaam
    -- (linking.py:111-112)
    SELECT person_id,
           (CASE WHEN roepnaam IS NOT NULL AND roepnaam <> ''
                 THEN roepnaam ELSE voornamen END) || ' ' || achternaam
               AS persoon_name
    FROM read_parquet('{cd}/persons.parquet')
), sms AS (
    SELECT v.url, v.warc_ts, v.object_id, v.achternaam,
           COALESCE(p.pid, '') AS pid,
           COALESCE(pn.persoon_name, '') AS persoon_name,
           row_number() OVER (
               PARTITION BY v.url, v.warc_ts, v.object_id
               ORDER BY (v.seq_pos IS NULL), COALESCE(v.seq_pos, 0),
                        v.doc_pos) AS smord
    FROM va v
    LEFT JOIN pid_map p ON p.url = v.url
        AND p.activity_local_id = v.object_id
        AND p.surface = trim(v.voornaam || ' ' || v.achternaam)
    LEFT JOIN pname pn ON pn.person_id = p.pid AND p.pid <> ''
), tgt AS (
    SELECT DISTINCT url, warc_ts, object_id, lower(achternaam) AS vlast
    FROM seq
), matched AS (
    -- _find_matching_speaker: first sms entry whose xml surname equals, or
    -- whose canonical persoon name contains, the target (emit.py:30-40)
    SELECT t.url, t.warc_ts, t.object_id, t.vlast, MIN(s.smord) AS hit
    FROM tgt t JOIN sms s ON s.url = t.url AND s.warc_ts = t.warc_ts
        AND s.object_id = t.object_id
        AND (lower(s.achternaam) = t.vlast
             OR (s.persoon_name <> ''
                 AND contains(lower(s.persoon_name), t.vlast)))
    GROUP BY ALL
), seq_pid AS (
    SELECT q.url, q.warc_ts, q.object_id, q.frag_no, q.pos,
           COALESCE(s.pid, '') AS pid
    FROM seq q
    LEFT JOIN matched m ON m.url = q.url AND m.warc_ts = q.warc_ts
        AND m.object_id = q.object_id AND m.vlast = lower(q.achternaam)
    LEFT JOIN sms s ON s.url = q.url AND s.warc_ts = q.warc_ts
        AND s.object_id = q.object_id AND s.smord = m.hit
), frag_ev AS (
    -- fragment interruptions: each later speaker vs the fragment's first
    SELECT url, warc_ts, object_id,
           'fragment_interruption' AS type,
           first_value(pid) OVER w AS interrupted, pid AS interrupter,
           '' AS responder,
           row_number() OVER w AS k
    FROM seq_pid
    WINDOW w AS (PARTITION BY url, warc_ts, object_id, frag_no ORDER BY pos)
    QUALIFY k > 1 AND interrupter <> interrupted
), seq_ev0 AS (
    SELECT url, warc_ts, object_id,
           lag(pid) OVER w AS a, pid AS b, lead(pid) OVER w AS nxt,
           row_number() OVER w AS i,
           count(*) OVER (PARTITION BY url, warc_ts, object_id) AS n
    FROM seq_pid
    WINDOW w AS (PARTITION BY url, warc_ts, object_id ORDER BY pos)
), seq_ev AS (
    -- sequential A->B(->A) scan over the whole activity sequence
    SELECT url, warc_ts, object_id,
           CASE WHEN nxt = a THEN 'interruption_with_response'
                ELSE 'simple_interruption' END AS type,
           a AS interrupted, b AS interrupter,
           CASE WHEN nxt = a THEN a ELSE '' END AS responder
    FROM seq_ev0
    WHERE i > 1 AND i < n AND a <> b
), events AS (
    SELECT url, warc_ts, object_id, type, interrupted, interrupter,
           responder FROM frag_ev
    UNION ALL
    SELECT url, warc_ts, object_id, type, interrupted, interrupter,
           responder FROM seq_ev
), derived AS (
    SELECT url, warc_ts, object_id AS activity_local_id, 'vote' AS kind,
           '' AS type, fractie_id, fractie_naam, vote, uitslag,
           is_hoofdelijk, '' AS topic, '' AS interrupter,
           '' AS interrupted, '' AS responder
    FROM vrow
    UNION ALL
    SELECT v.url, v.warc_ts, v.object_id, 'vote_topic', '', v.fractie_id,
           v.fractie_naam, v.vote, v.uitslag, v.is_hoofdelijk, t.topic,
           '', '', ''
    FROM vrow v JOIN topics t ON t.url = v.url AND t.warc_ts = v.warc_ts
        AND t.object_id = v.object_id
    UNION ALL
    SELECT url, warc_ts, object_id, 'interruption', type, '', '', '', '',
           FALSE, '', interrupter, interrupted, responder
    FROM events
    UNION ALL
    SELECT e.url, e.warc_ts, e.object_id, 'interruption_topic', e.type,
           '', '', '', '', FALSE, t.topic, e.interrupter, e.interrupted,
           e.responder
    FROM events e JOIN topics t ON t.url = e.url AND t.warc_ts = e.warc_ts
        AND t.object_id = e.object_id
), exp_r AS (
    -- ranked multiset join pulling the sha1 event_id from ground truth
    SELECT *, row_number() OVER (
        PARTITION BY url, activity_local_id, kind, type, fractie_id,
                     fractie_naam, vote, uitslag, is_hoofdelijk, topic,
                     interrupter, interrupted, responder
        ORDER BY event_id) AS rnk
    FROM read_parquet('{cd}/expected_analysis.parquet')
), drv_r AS (
    SELECT url, activity_local_id, kind, type, fractie_id, fractie_naam,
           vote, uitslag, is_hoofdelijk, topic, interrupter, interrupted,
           responder,
           row_number() OVER (
               PARTITION BY url, activity_local_id, kind, type, fractie_id,
                            fractie_naam, vote, uitslag, is_hoofdelijk,
                            topic, interrupter, interrupted, responder)
               AS rnk
    FROM derived
)
SELECT e.url, e.activity_local_id, e.kind, e.type, e.event_id,
       e.fractie_id, e.fractie_naam, e.vote, e.uitslag, e.is_hoofdelijk,
       e.topic, e.interrupter, e.interrupted, e.responder
FROM exp_r e
JOIN drv_r d USING (url, activity_local_id, kind, type, fractie_id,
                    fractie_naam, vote, uitslag, is_hoofdelijk, topic,
                    interrupter, interrupted, responder, rnk)
"""
