; Config 2 in the reference's native S-expression task format
; (equivalent to block_compression_tet10.json)
(task
  (mesh (box (nx 4) (ny 4) (nz 4)))
  (element-type tet10)
  (material (model neo-hookean) (E 1.0) (nu 0.3))
  (loading
    (n-steps 4)
    (dirichlet (set zmin) (components xyz) (value 0.0))
    (dirichlet (set zmax) (components z) (value -0.3)))
  (solver (linear pcg_bcsr) (pcg-tol 1e-12))
  (output (dir "out/block_compression_sexp")))
