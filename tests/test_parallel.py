"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    from blasr_tpu.pipeline.mapper import unpack_result

    fn, args = ge.entry()
    res = jax.jit(fn)(*args)
    jax.block_until_ready(res)
    host = unpack_result(res, 2)
    assert host.sel_valid.sum() >= 4


def test_sharded_matches_single_device():
    """SPMD result must equal the single-device result."""
    import __graft_entry__ as ge
    from blasr_tpu.parallel.mesh import make_mesh, sharded_map_batch
    from blasr_tpu.pipeline.mapper import make_device_index, _map_batch_impl

    index, params, codes, lengths = ge._tiny_problem(n_reads=8, seed=5)
    di = make_device_index(index, params)

    single = _map_batch_impl(
        codes, lengths,
        di.genome_pad, di.arrays, di.starts,
        params=params, pad=di.pad, k=di.k, genome_len=di.genome_len,
        index_kind=di.kind, fm_n=di.fm_n,
    )
    mesh = make_mesh(4)
    multi = sharded_map_batch(mesh, di, params, codes, lengths)
    np.testing.assert_array_equal(np.asarray(single.sel_ints), np.asarray(multi.sel_ints))
    np.testing.assert_array_equal(np.asarray(single.read_ints), np.asarray(multi.read_ints))
    np.testing.assert_array_equal(
        np.asarray(single.moves_packed), np.asarray(multi.moves_packed)
    )
