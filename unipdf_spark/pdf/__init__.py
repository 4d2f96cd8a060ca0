"""Pure-Python PDF decode + extraction core. No Spark imports here — this
package runs inside Arrow-batched Python workers (mapInPandas)."""
