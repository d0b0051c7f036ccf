"""Agent feedback-loop coverage + training checkpoint roundtrip."""

import numpy as np
import pytest

from optimized_rag_tpu.agent.agent import RAGAgent
from optimized_rag_tpu.agent.llm import DeterministicLLM
from optimized_rag_tpu.agent.state import AgentState
from optimized_rag_tpu.agent.nodes import decisions
from optimized_rag_tpu.agent.web import WebSearchTool
from optimized_rag_tpu.config import Settings
from optimized_rag_tpu.store.checkpoint import TrainCheckpointer

from fakes import FakeEmbedder, FakeCrossEncoder


@pytest.fixture
def agent():
    return RAGAgent(Settings(), llm=DeterministicLLM(),
                    embed_service=FakeEmbedder(dim=32),
                    cross_encoder=FakeCrossEncoder(),
                    web=WebSearchTool(search_fn=lambda q, n: []))


# ------------------------------------------------------------ decision caps

def test_regeneration_capped(agent):
    st = AgentState(user_input="q", support_ratio=0.1)
    st.rag_context = ["x"]  # non-empty so not refused path
    assert decisions.should_regenerate(st, agent) == "regenerate"
    assert st.regeneration_attempts == 1
    # cap = 1 (reference config.py:63)
    assert decisions.should_regenerate(st, agent) == "accept"


def test_refinement_capped(agent):
    st = AgentState(user_input="q", verification_passed=False)
    st.rag_context = [1]
    assert decisions.should_refine_query(st, agent) == "refine"
    st.refinement_attempts = agent.settings.loops.max_refinement_attempts
    assert decisions.should_refine_query(st, agent) == "continue"


def test_web_search_once_per_session(agent):
    agent.web = WebSearchTool(search_fn=lambda q, n: [
        {"title": "t", "content": "c", "url": ""}])
    st = AgentState(user_input="q", factuality_score=0.1)
    assert decisions.should_try_web_search(st, agent) == "web_search"
    st.web_search_attempted = True
    assert decisions.should_try_web_search(st, agent) == "continue"


def test_cot_decision_rules(agent):
    from optimized_rag_tpu.engine.types import Intent
    st = AgentState(user_input="short", query_intent=Intent.COMPARISON)
    assert decisions.should_use_cot(st, agent) == "cot"
    st2 = AgentState(user_input="hello there",
                     query_intent=Intent.CONVERSATIONAL)
    assert decisions.should_use_cot(st2, agent) == "skip"
    long_multi = "why is this? and how does that work? " * 3
    st3 = AgentState(user_input=long_multi)
    assert decisions.should_use_cot(st3, agent) == "cot"
    agent.settings.flags.enable_cot = False
    assert decisions.should_use_cot(st, agent) == "skip"
    agent.settings.flags.enable_cot = True


def test_refinement_loop_runs_in_graph(agent):
    """An unanswerable query with context triggers the refine loop and
    terminates within the caps."""
    agent.ingestor.ingest_text("completely unrelated banana content here")
    trace = []
    resp = agent.chat("quantum flux capacitor calibration", trace=trace)
    assert trace.count("generate_response") <= 1 + \
        agent.settings.loops.max_regeneration_attempts + \
        agent.settings.loops.max_refinement_attempts + 1
    assert isinstance(resp.answer, str)


# --------------------------------------------------------------- checkpoint

def test_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    ck = TrainCheckpointer(str(tmp_path))
    ck.save(7, state)
    assert ck.latest_step() == 7
    restored = ck.restore(like=state)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(np.asarray(restored["step"])) == 7


def test_checkpointer_trainer_state(tmp_path, rng):
    """Save/restore a real trainer state and keep training."""
    import jax
    import jax.numpy as jnp
    from optimized_rag_tpu.models.decoder import DecoderConfig, encode_bytes
    from optimized_rag_tpu.models.training import DecoderTrainer
    from optimized_rag_tpu.parallel.mesh import make_mesh
    cfg = DecoderConfig(hidden_dim=32, num_layers=1, num_heads=2,
                        mlp_dim=64, max_seq_len=64, dtype=jnp.float32)
    mesh = make_mesh(data=8, model=1)
    tr = DecoderTrainer(cfg, mesh, learning_rate=1e-3)
    ids = np.tile(encode_bytes("abc def ", 32), (8, 1)).astype(np.int32)
    tr.train_step(ids)
    ck = TrainCheckpointer(str(tmp_path))
    ck.save(1, {"params": tr.params, "opt_state": tr.opt_state})
    restored = ck.restore(
        like={"params": tr.params, "opt_state": tr.opt_state})
    tr2 = DecoderTrainer(cfg, mesh, learning_rate=1e-3)
    from optimized_rag_tpu.models.training import shard_params
    tr2.params = shard_params(restored["params"], mesh)
    # Resume with the restored OPTIMIZER STATE too: the orbax path must
    # hand back optax namedtuples (not plain dicts) or tx.update breaks.
    tr2.opt_state = jax.tree_util.tree_map(
        lambda x: x, restored["opt_state"])
    assert jax.tree_util.tree_structure(restored["opt_state"]) \
        == jax.tree_util.tree_structure(tr.opt_state)
    loss = tr2.train_step(ids)
    assert np.isfinite(loss)


def test_agent_warmup(agent):
    agent.ingestor.ingest_text("warmup corpus doc about things")
    seconds = agent.warmup()
    assert seconds >= 0
