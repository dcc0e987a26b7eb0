"""Real-time serving engine: UDS server around the jitted RTI solver.

Plays the role the generated `acados_solve()` + node main loop play in the
reference (one low-latency solve per 20 Hz tick per vehicle,
SURVEY.md section 3.1), re-shaped for a device runtime:

- each client connection is one vehicle; its SQP-RTI warm start
  (`SolverState`) is held server-side between ticks, exactly like acados
  keeping its primal iterate in process memory (SURVEY.md section 5,
  checkpoint/resume);
- requests from concurrent vehicles within a batching window are packed
  into ONE device program call (the latency/throughput middle path of
  BASELINE.md: a fleet of 20 Hz vehicles shares the chip);
- the asyncio loop is the transport; compute never blocks it for other
  clients while a batch is in flight.

Run standalone:  python -m mpc_collisionavoidance_tpu.rt.server /tmp/nmpc.sock
"""

import asyncio
import concurrent.futures
import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_collisionavoidance_tpu.ocp import builders
from mpc_collisionavoidance_tpu.rt import protocol
from mpc_collisionavoidance_tpu.solver.sqp_rti import RTISolver, SolverState


@dataclasses.dataclass
class _Vehicle:
    state: SolverState
    seq: int = 0


class RTServer:
    def __init__(self, path: str, N: int = 100, Tf: float = 5.0,
                 ipm_iters: int = 8, batch_window_ms: float = 2.0,
                 max_batch: int = 128):
        self.path = path
        self.solver = RTISolver(builders.usv_guidance_ca1(Tf=Tf, N=N),
                                ipm_iters=ipm_iters)
        self.batch_window = batch_window_ms / 1e3
        self.max_batch = max_batch
        self._step1 = jax.jit(self.solver.step_fn)
        self._stepB = jax.jit(jax.vmap(self.solver.step_fn))
        self._vehicles: Dict[int, _Vehicle] = {}
        self._next_id = 0
        self._queue: asyncio.Queue = asyncio.Queue()
        self._server: Optional[asyncio.AbstractServer] = None
        # single dedicated solve thread: solves are serialized anyway (one
        # device), and owning it lets warmup() pre-warm exactly this thread
        self._executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="nmpc-solve")

    # ------------------------------------------------------------------
    def warmup(self, all_buckets: bool = False):
        """Compile the single-vehicle and batched paths up front so the
        first real tick meets the latency budget (acados pays this at
        codegen/compile time; we pay it here).  Batched solves are padded
        to power-of-two buckets; `all_buckets=True` pre-compiles every
        bucket up to max_batch (production fleets), the default warms only
        the smallest (dev startup time)."""
        sc_x0 = np.zeros(protocol.NX, np.float32)
        st = self.solver.init_state(sc_x0)
        p = jnp.zeros(protocol.NP, jnp.float32)
        lh = jnp.zeros(protocol.NH, jnp.float32)
        st, out = self._step1(st, jnp.asarray(sc_x0), p, lh)
        jax.block_until_ready(out.u0)
        buckets = ([1 << k for k in range(1, (self.max_batch - 1)
                                          .bit_length() + 1)]
                   if all_buckets else [2])
        for b in buckets:
            stB = jax.vmap(lambda _: self.solver.init_state(sc_x0))(
                jnp.arange(b))
            xB = jnp.zeros((b, protocol.NX), jnp.float32)
            _, outB = self._stepB(stB, xB, jnp.zeros((b, protocol.NP)),
                                  jnp.zeros((b, protocol.NH)))
            jax.block_until_ready(outB.u0)
        # warm the dispatch path ON THE SOLVE THREAD — the first solve from
        # a worker thread pays extra overhead that must not hit tick 0
        self._executor.submit(self._prewarm).result()

    # ------------------------------------------------------------------
    async def start(self):
        self._server = await asyncio.start_unix_server(
            self._handle_client, path=self.path)
        self._batcher = asyncio.create_task(self._batch_loop())

    async def stop(self):
        self._batcher.cancel()
        self._server.close()
        await self._server.wait_closed()

    # ------------------------------------------------------------------
    async def _handle_client(self, reader: asyncio.StreamReader,
                             writer: asyncio.StreamWriter):
        vid = self._next_id
        self._next_id += 1
        try:
            while True:
                buf = await reader.readexactly(protocol.REQ_SIZE)
                req = protocol.unpack_request(buf)
                fut = asyncio.get_running_loop().create_future()
                await self._queue.put((vid, req, fut))
                resp: protocol.Response = await fut
                writer.write(protocol.pack_response(resp))
                await writer.drain()
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        finally:
            self._vehicles.pop(vid, None)
            writer.close()

    # ------------------------------------------------------------------
    async def _batch_loop(self):
        """Collect requests for up to `batch_window`, solve them as one
        batched device call, fan the replies back out."""
        while True:
            vid, req, fut = await self._queue.get()
            batch = [(vid, req, fut)]
            deadline = asyncio.get_running_loop().time() + self.batch_window
            while len(batch) < self.max_batch:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(
                        self._queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            await asyncio.get_running_loop().run_in_executor(
                self._executor, self._solve_batch, batch)

    # ------------------------------------------------------------------
    def _prewarm(self):
        """Throwaway solve absorbing first-dispatch overhead on the thread
        that will serve requests (run from warmup(); measured ~60 ms that
        would otherwise land inside the first vehicle's tick-0 budget)."""
        zeros = np.zeros(protocol.NX, np.float32)
        st = self.solver.init_state(zeros)
        _, out = self._step1(st, jnp.asarray(zeros),
                             jnp.zeros(protocol.NP, jnp.float32),
                             jnp.zeros(protocol.NH, jnp.float32))
        jax.block_until_ready(out.u0)

    # ------------------------------------------------------------------
    def _solve_batch(self, batch):
        for vid, req, _ in batch:
            if vid not in self._vehicles:
                self._vehicles[vid] = _Vehicle(
                    state=self.solver.init_state(
                        np.asarray(req.x0, np.float32)))

        if len(batch) == 1:
            vid, req, fut = batch[0]
            veh = self._vehicles[vid]
            new_state, out = self._step1(
                veh.state, jnp.asarray(req.x0, jnp.float32),
                jnp.asarray(req.p_obs, jnp.float32),
                jnp.asarray(req.r_obs, jnp.float32))
            veh.state = new_state
            self._reply(fut, req, out.status, out.u0, out.x1)
            return

        # pad to the next power-of-two bucket: jit caches one executable
        # per shape, so buckets bound the number of compiles to
        # log2(max_batch) instead of max_batch (a fresh fleet size would
        # otherwise stall its first tick on a full XLA compile)
        n = len(batch)
        bucket = 1 << (n - 1).bit_length()
        pad = bucket - n
        veh_states = [self._vehicles[vid].state for vid, _, _ in batch]
        veh_states += [veh_states[0]] * pad
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *veh_states)
        row0 = batch[0][1]
        x0 = jnp.asarray([r.x0 for _, r, _ in batch]
                         + [row0.x0] * pad, jnp.float32)
        p = jnp.asarray([r.p_obs for _, r, _ in batch]
                        + [row0.p_obs] * pad, jnp.float32)
        lh = jnp.asarray([r.r_obs for _, r, _ in batch]
                         + [row0.r_obs] * pad, jnp.float32)
        new_states, outs = self._stepB(states, x0, p, lh)
        for i, (vid, req, fut) in enumerate(batch):
            self._vehicles[vid].state = jax.tree.map(
                lambda a, idx=i: a[idx], new_states)
            self._reply(fut, req, outs.status[i], outs.u0[i], outs.x1[i])

    @staticmethod
    def _reply(fut, req, status, u0, x1):
        resp = protocol.Response(
            seq=req.seq, status=int(status),
            u0=float(np.asarray(u0).reshape(-1)[0]),
            x1=tuple(np.asarray(x1, np.float32)))
        fut.get_loop().call_soon_threadsafe(fut.set_result, resp)


async def _amain(path: str, warm_all: bool = False, **kw):
    server = RTServer(path, **kw)
    server.warmup(all_buckets=warm_all)
    await server.start()
    print(f"rt server listening on {path}", flush=True)
    await asyncio.Event().wait()


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="NMPC real-time server")
    parser.add_argument("socket", nargs="?", default="/tmp/nmpc_rt.sock")
    parser.add_argument("--platform", default=None,
                        help="jax platform to pin (cpu/tpu). Uses "
                             "jax_default_device rather than JAX_PLATFORMS: "
                             "only the named backend is initialized, and on "
                             "axon-tunneled images JAX_PLATFORMS=cpu is known "
                             "to deadlock device fetches from worker threads.")
    parser.add_argument("-N", type=int, default=100)
    parser.add_argument("--tf", type=float, default=5.0)
    parser.add_argument("--ipm-iters", type=int, default=8)
    parser.add_argument("--warm-all", action="store_true",
                        help="pre-compile every power-of-two batch bucket "
                             "up to max_batch at startup (production "
                             "fleets; dev default warms only bucket 2)")
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_default_device",
                          jax.devices(args.platform)[0])
    asyncio.run(_amain(args.socket, warm_all=args.warm_all,
                       N=args.N, Tf=args.tf, ipm_iters=args.ipm_iters))


if __name__ == "__main__":
    main()
