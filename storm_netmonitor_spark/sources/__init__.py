"""Custom data sources (pyspark.sql.datasource implementations).

A regular package on purpose: as an implicit NAMESPACE package this
worked from the filesystem but was invisible to zipimport when the
package zip ships to executor Python workers via addPyFile (found by
the round-9 full-registry local-cluster sweep — stream_gap_alert /
stream_alert_suppress died executor-side with ModuleNotFoundError).
"""
