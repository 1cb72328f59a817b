from fea_large_tpu.ops.smallmat import adjugate3, det3, inv3, inv_det3, sym3  # noqa: F401

# ops.soa and ops.pallas_kernels import material classes; import them
# directly (not via this package root) to avoid circular imports.
