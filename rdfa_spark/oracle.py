"""DuckDB oracle SQL for the driver's correctness gate.

Because pages are rendered deterministically from the documents table
(rdfa_spark/pages.py), the *expected* output of the whole extraction
pipeline is expressible in ANSI SQL over ``documents`` — every query
in __spark_entry__.py pairs a Spark implementation with one of these
oracle strings.  Keep the constants in sync with pages.py (single
source of truth for the template geometry lives there; this module
re-states it in SQL).
"""

from __future__ import annotations

DC = "http://purl.org/dc/terms/"
OG = "http://ogp.me/ns#"
SCHEMA = "http://schema.org/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
URL_PREFIX = "http://example.org/doc/"

# Shared CTE: one row per document with all derived template fields.
DOCS_CTE = f"""
WITH d AS (
  SELECT doc_id,
         text,
         source,
         NULLIF(lang, '') AS lng,
         '{URL_PREFIX}' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         CAST(doc_id % 3 AS INTEGER) AS t,
         (CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN 'Entity ' WHEN 1 THEN 'entity '
            ELSE 'Entity-' END)
           || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0') AS entity,
         '{URL_PREFIX}' || lpad(CAST((doc_id * 7 + 1) %
             (SELECT count(*) FROM documents) AS VARCHAR), 6, '0')
           AS rel_url
  FROM documents
)
"""

TRIPLES_CTE = DOCS_CTE + f""",
trip AS (
  SELECT url, url AS subj, '{DC}title' AS pred, title AS obj,
         TRUE AS obj_is_literal, CAST(NULL AS VARCHAR) AS obj_datatype,
         lng AS obj_lang
  FROM d
  UNION ALL SELECT url, url, '{OG}title', title, TRUE, NULL, lng FROM d
  UNION ALL SELECT url, url, '{OG}type',
         CASE t WHEN 0 THEN 'article' WHEN 1 THEN 'website'
                ELSE 'profile' END, TRUE, NULL, lng FROM d
  UNION ALL SELECT url, url || '#main', '{RDF}type',
         '{SCHEMA}Article', FALSE, NULL, NULL FROM d WHERE t IN (0, 1)
  UNION ALL SELECT url, url || '#main', '{DC}source', source,
         TRUE, NULL, lng FROM d
  UNION ALL SELECT url, url || '#person', '{RDF}type',
         '{SCHEMA}Person', FALSE, NULL, NULL FROM d
  UNION ALL SELECT url, url || '#person', '{SCHEMA}name', entity,
         TRUE, NULL, lng FROM d
  UNION ALL SELECT url, url || '#main', '{DC}relation', rel_url,
         FALSE, NULL, NULL FROM d
  UNION ALL SELECT url, url || '#main', '{DC}description', text,
         TRUE, NULL, lng FROM d
)
"""

RDFA_TRIPLES_SQL = TRIPLES_CTE + """
SELECT url, subj, pred, obj, obj_is_literal, obj_datatype, obj_lang
FROM trip
"""

RDFA_OG_TITLE_SQL = DOCS_CTE + """
SELECT url, 'title' AS property, title AS value FROM d
"""

RDFA_PRED_COUNTS_SQL = TRIPLES_CTE + """
SELECT pred, CAST(count(*) AS BIGINT) AS n_triples
FROM trip GROUP BY pred
"""

RDFA_TEXT_SQL = DOCS_CTE + """
SELECT url, title || source || 'who' || 'rel' || text AS text FROM d
"""

ENTITY_MENTIONS_SQL = DOCS_CTE + """
SELECT url || '#person' AS mention,
       entity AS label,
       'entity' || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0')
         AS entity_key
FROM d
"""
