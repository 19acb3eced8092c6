"""Dataset + loader tests over synthetic media stores."""

import io

import numpy as np
import pytest

from clipbert_tpu.data import datasets, loader, store, tokenization, video


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    tokenization.write_tiny_vocab(str(p), extra_tokens=["cat", "dog", "runs",
                                                        "a", "the"])
    return tokenization.BertTokenizer(str(p))


def make_jpeg(seed, h=40, w=40):
    from PIL import Image
    rng = np.random.default_rng(seed)
    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, :, 0] = rng.integers(0, 255)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def make_video_blob(seed, n_frames=20, h=32, w=32):
    frames = np.full((n_frames, h, w, 3), 100, np.uint8)
    for t in range(n_frames):
        frames[t, :, :, 1] = min(255, t * 8)
    return video.encode_jseq_from_array(frames, fps=10.0)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("media") / "m.cbpk")
    with store.PackWriter(p) as w:
        for i in range(6):
            w.put(f"img{i}", make_jpeg(i))
            w.put(f"vid{i}", make_video_blob(i))
    return store.open_store(p)


def test_pretrain_dataset_and_collator(tok, media):
    datalist = [(f"img{i}", [{"txt": "a cat runs"}, {"txt": "the dog"}])
                for i in range(4)]
    ds = datasets.PretrainDataset(datalist, tok, media, max_img_size=48,
                                  itm_neg_prob=0.5, seed=0)
    item = ds[0]
    assert item["vis"].shape == (1, 48, 48, 3)
    assert len(item["examples"]) == 2
    coll = datasets.PretrainCollator(tok, mlm=True, max_length=8, seed=0)
    batch = coll([ds[0], ds[1]])
    assert batch["visual_inputs"].shape == (2, 1, 48, 48, 3)
    assert batch["text_input_ids"].shape == (4, 8)
    assert batch["itm_labels"].shape == (4,)
    assert batch["mlm_labels"].shape == (4, 8)
    assert set(np.unique(batch["itm_labels"])) <= {0, 1}


def test_pretrain_itm_neg_rate(tok, media):
    datalist = [(f"img{i % 6}", [{"txt": "a cat"}]) for i in range(6)]
    ds = datasets.PretrainDataset(datalist, tok, media, max_img_size=32,
                                  itm_neg_prob=1.0, seed=0)
    labels = [ds[i]["examples"][0]["itm_label"] for i in range(6)]
    assert all(l == 0 for l in labels)
    ds_pos = datasets.PretrainDataset(datalist, tok, media, max_img_size=32,
                                      itm_neg_prob=0.0, seed=0)
    labels = [ds_pos[i]["examples"][0]["itm_label"] for i in range(6)]
    assert all(l == 1 for l in labels)


def test_retrieval_train_dataset(tok, media):
    datalist = [(f"vid{i}", [{"txt": "a cat runs", "id": i}])
                for i in range(4)]
    ds = datasets.VideoRetrievalTrainDataset(
        datalist, tok, media, num_frm=2, fps=5, max_img_size=32,
        itm_neg_size=1, ensemble_n_clips=2, random_sample_clips=True, seed=0)
    item = ds[0]
    assert item["vis"].shape == (4, 32, 32, 3)  # 2 clips x 2 frames
    assert len(item["examples"]) == 2  # 1 pos + 1 neg
    assert item["examples"][0]["itm_label"] == 1
    assert item["examples"][1]["itm_label"] == 0
    coll = datasets.RetrievalCollator(tok, max_length=8)
    batch = coll([ds[0], ds[1]])
    assert batch["visual_inputs"].shape == (2, 4, 32, 32, 3)
    assert batch["text_input_ids"].shape == (4, 8)
    assert (batch["labels"] == [1, 0, 1, 0]).all()


def test_retrieval_eval_dataset(tok, media):
    datalist = [{"id": i, "txt": f"cat {i}", "vid_id": f"vid{i % 3}"}
                for i in range(6)]
    ds = datasets.VideoRetrievalEvalDataset(
        datalist, tok, media, num_frm=2, fps=5, max_img_size=32,
        ensemble_n_clips=2)
    assert len(ds) == 3  # unique videos
    caps = ds.encode_all_captions()
    assert caps["text_input_ids"].shape[0] == 6
    gt = ds.gt_matrix()
    assert gt.shape == (3, 6)
    assert gt.sum() == 6
    assert gt[0, 0] and gt[0, 3] and gt[1, 1]
    item = ds[0]
    assert item["vis"].shape == (4, 32, 32, 3)


def test_video_qa_mc_dataset(tok, media):
    datalist = [(f"vid{i}", [{"question": "the cat", "question_id": 10 + i,
                              "answer": 2,
                              "options": [f"a {j}" for j in range(5)]}])
                for i in range(3)]
    ds = datasets.VideoQADataset("action", datalist, tok, media, num_frm=1,
                                 fps=5, max_img_size=32, ensemble_n_clips=1)
    item = ds[0]
    assert len(item["examples"][0]["texts"]) == 5
    assert item["examples"][0]["texts"][0].endswith("a 0")
    coll = datasets.VideoQACollator(tok, max_length=10)
    batch = coll([ds[0], ds[1]])
    assert batch["text_input_ids"].shape == (10, 10)  # 2 q x 5 options
    assert (batch["labels"] == [2, 2]).all()
    # metric
    res = [{"question_id": 10, "answer": 2}, {"question_id": 11, "answer": 0}]
    m = ds.evaluate_tgif_qa(res)
    np.testing.assert_allclose(m["overall_acc"], 0.5)


def test_video_qa_open_ended(tok, media):
    ans2label = {"cat": 0, "dog": 1}
    datalist = [(f"vid{i}", [{"question": "the cat", "question_id": i,
                              "answer": "cat", "answer_type": "what"}])
                for i in range(2)]
    ds = datasets.VideoQADataset("msrvtt_qa", datalist, tok, media,
                                 ans2label=ans2label, num_frm=1, fps=5,
                                 max_img_size=32)
    assert ds[0]["examples"][0]["label"] == 0
    m = ds.evaluate_tgif_qa([{"question_id": 0, "answer": 0},
                             {"question_id": 1, "answer": 1}])
    np.testing.assert_allclose(m["overall_acc"], 0.5)
    assert "what_acc" in m


def test_vqa_dataset(tok, media):
    ans2label = {"down": 0, "table": 1, "cat": 2}
    datalist = [(f"img{i}", [{"txt": "the cat", "question_id": i,
                              "labels": {"down": 1.0, "table": 0.3},
                              "answer_type": "other"}])
                for i in range(2)]
    ds = datasets.VQADataset(datalist, tok, media, max_img_size=32,
                             ans2label=ans2label)
    item = ds[0]
    t = item["examples"][0]["label"]
    np.testing.assert_allclose(t, [1.0, 0.3, 0.0])
    m = ds.evaluate_vqa([{"question_id": 0, "answer": "down"},
                         {"question_id": 1, "answer": "cat"}])
    np.testing.assert_allclose(m["overall_acc"], 0.5)
    coll = datasets.RetrievalCollator(tok, max_length=8)
    batch = coll([ds[0], ds[1]])
    assert batch["labels"].shape == (2, 3)
    assert batch["question_ids"] == [0, 1]


def test_sharded_batch_sampler():
    shards = []
    for pi in range(2):
        s = loader.ShardedBatchSampler(20, 3, shuffle=True, seed=1,
                                       process_index=pi, process_count=2)
        shards.append([i for b in s for i in b])
    # disjoint across hosts
    assert not (set(shards[0]) & set(shards[1]))
    # drop_last: 10 per host -> 3 batches of 3
    s = loader.ShardedBatchSampler(20, 3, process_index=0, process_count=2)
    assert len(list(s)) == 3 == len(s)
    # different epoch -> different order
    s.set_epoch(0); e0 = list(s)
    s.set_epoch(1); e1 = list(s)
    assert e0 != e1


def test_dataloader_threaded():
    class Squares:
        def __getitem__(self, i):
            return i * i

    sampler = loader.ShardedBatchSampler(10, 2, shuffle=False,
                                         drop_last=True)
    dl = loader.DataLoader(Squares(), sampler, collate_fn=list,
                           num_workers=3)
    out = list(dl)
    assert out == [[0, 1], [4, 9], [16, 25], [36, 49], [64, 81]]


def test_meta_loader_ratio():
    class FakeLoader:
        def __init__(self, tag):
            self.tag = tag

        def __iter__(self):
            return iter([self.tag] * 5)

    ml = loader.MetaLoader({"a": FakeLoader("a"), "b": FakeLoader("b")},
                           ratios={"a": 3.0, "b": 1.0}, seed=0)
    it = iter(ml)
    tasks = [next(it)[0] for _ in range(400)]
    frac_a = tasks.count("a") / len(tasks)
    assert 0.65 < frac_a < 0.85


def test_infinite_iterator():
    class L:
        def __init__(self):
            self.sampler = loader.ShardedBatchSampler(4, 2, shuffle=False)

        def __iter__(self):
            return iter([1, 2])

    it = iter(loader.InfiniteIterator(L()))
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]


def test_ingest_cli(tmp_path):
    """Image ingest: dir -> CBPK store with JPEG re-encode (file2lmdb flow)."""
    import io
    from PIL import Image
    from clipbert_tpu.data import ingest, store
    src = tmp_path / "raw"
    src.mkdir()
    for i in range(3):
        Image.fromarray(np.full((10, 10, 3), i * 50, np.uint8)).save(
            src / f"im{i}.png")
    out = str(tmp_path / "imgs.cbpk")
    n, errors = ingest.ingest(str(src), out, "image", num_workers=2)
    assert n == 3 and not errors
    s = store.open_store(out)
    blob = s.get("im1")
    img = Image.open(io.BytesIO(bytes(blob)))
    assert img.format == "JPEG" and img.size == (10, 10)


def test_ingest_video_jseq(tmp_path):
    """Video ingest with JSEQ transcode round-trips through decode_clip."""
    from clipbert_tpu.data import ingest, store, video
    src = tmp_path / "vids"
    src.mkdir()
    frames = np.full((10, 16, 16, 3), 99, np.uint8)
    (src / "v0.gif").write_bytes(b"")  # undecodable -> error log
    blob = video.encode_jseq_from_array(frames, fps=5)
    (src / "v1.mp4").write_bytes(blob)  # already JSEQ bytes: pass-through
    out = str(tmp_path / "vids.cbpk")
    n, errors = ingest.ingest(str(src), out, "video", to_jseq=True,
                              num_workers=1)
    assert n >= 1
    s = store.open_store(out)
    clip = video.decode_clip(bytes(s.get("v1")), 2, 5, "uniform")
    assert clip.shape == (2, 16, 16, 3)


def test_meta_loader_host_determinism():
    """Same seed -> identical task sequence on every host (replaces the
    reference's any_broadcast task sync, dataloader.py:44-46)."""
    class FakeLoader:
        def __init__(self, tag):
            self.tag = tag

        def __iter__(self):
            return iter([self.tag] * 3)

    def seq():
        ml = loader.MetaLoader({"a": FakeLoader("a"), "b": FakeLoader("b")},
                               ratios={"a": 2.0, "b": 1.0}, accum_steps=2,
                               seed=11)
        it = iter(ml)
        return [next(it)[0] for _ in range(40)]

    s1, s2 = seq(), seq()
    assert s1 == s2
    # accumulation windows keep the same task for accum_steps consecutive
    for i in range(0, 40, 2):
        assert s1[i] == s1[i + 1]


def test_eval_datasets_degrade_on_undecodable_video(tok, tmp_path):
    """One corrupt eval video must NOT kill a full-matrix run: the eval
    datasets substitute black frames + a warning (matching the reference's
    degrade-don't-die eval behavior, dataset_video_retrieval.py:48-56),
    while good videos in the same store decode normally."""
    p = str(tmp_path / "poisoned.cbpk")
    with store.PackWriter(p) as w:
        w.put("vid_good", make_video_blob(0))
        w.put("vid_bad", b"\x00\x01 this is not a video \xff" * 20)
    s = store.open_store(p)

    datalist = [{"id": 0, "txt": "cat", "vid_id": "vid_good"},
                {"id": 1, "txt": "dog", "vid_id": "vid_bad"}]
    ds = datasets.VideoRetrievalEvalDataset(
        datalist, tok, s, num_frm=2, fps=5, max_img_size=32,
        ensemble_n_clips=2)
    good = ds[0]
    assert good["vis"].shape == (4, 32, 32, 3)
    bad = ds[1]
    assert bad["vis"].shape == (4, 32, 32, 3)
    assert (bad["vis"] == 0).all()
    assert bad["vid_id"] == "vid_bad"

    # also the missing-key case (store returns None)
    ds_missing = datasets.VideoRetrievalEvalDataset(
        [{"id": 0, "txt": "cat", "vid_id": "vid_gone"}], tok, s,
        num_frm=2, fps=5, max_img_size=32, ensemble_n_clips=1)
    assert (ds_missing[0]["vis"] == 0).all()

    mc_list = [{"id": 7, "vid_id": "vid_bad",
                "options": [f"o {j}" for j in range(5)], "answer": 1}]
    mc = datasets.MSRVTTMCEvalDataset(mc_list, tok, s, num_frm=2, fps=5,
                                      max_img_size=32, ensemble_n_clips=2)
    item = mc[0]
    assert (item["vis"] == 0).all()
    assert len(item["examples"]) == 5

    # VideoQA EVAL must keep the original item's question_ids (never
    # substitute another video's examples) and degrade to black frames
    qa_list = [("vid_bad", [{"question": "what", "question_id": 99,
                             "answer": "cat"}])]
    qa = datasets.VideoQADataset(
        "msrvtt_qa", qa_list, tok, s, num_frm=2, fps=5, max_img_size=32,
        ans2label={"cat": 0}, ensemble_n_clips=2, is_train=False)
    item = qa[0]
    assert (item["vis"] == 0).all()
    assert item["examples"][0]["question_id"] == 99

    # VQA: missing/corrupt image degrades the same way
    vqa = datasets.VQADataset(
        [("img_gone", [{"txt": "what", "question_id": 3}])], tok, s,
        max_img_size=32, ans2label={"cat": 0})
    assert (vqa[0]["vis"] == 0).all()
    assert vqa[0]["examples"][0]["question_id"] == 3

    # VQA TRAIN must NEVER train on (black image, real label): a missing
    # image resamples another item (dataset_pretrain.py:46-59 semantics)
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((8, 8, 3), 7, np.uint8)).save(buf, format="JPEG")
    p2 = str(tmp_path / "train.cbpk")
    with store.PackWriter(p2) as w:
        w.put("img_ok", buf.getvalue())
    s2 = store.open_store(p2)
    vqa_train = datasets.VQADataset(
        [("img_gone", [{"txt": "what", "question_id": 3}]),
         ("img_ok", [{"txt": "who", "question_id": 4}])], tok, s2,
        max_img_size=32, ans2label={"cat": 0}, is_train=True)
    item = vqa_train[0]                      # resampled to the good item
    assert (item["vis"] != 0).any()
    assert item["examples"][0]["question_id"] == 4
    # a train store with NO loadable image fails loudly, never black frames
    vqa_all_bad = datasets.VQADataset(
        [("img_gone", [{"txt": "what", "question_id": 3}])], tok, s2,
        max_img_size=32, ans2label={"cat": 0}, is_train=True)
    with pytest.raises(RuntimeError):
        vqa_all_bad[0]


def test_eval_fallback_respects_device_preprocess_bucket(tok, tmp_path):
    """With device_preprocess=True the black-frame substitute must stay at
    the 64px collate bucket: a max_img_size-sized fallback would raise the
    batch bucket above every real (e.g. 240x320) video and force a fresh
    device_preprocess compile mid-eval."""
    p = str(tmp_path / "poisoned.cbpk")
    with store.PackWriter(p) as w:
        w.put("vid_bad", b"nope" * 50)
    s = store.open_store(p)
    ds = datasets.VideoRetrievalEvalDataset(
        [{"id": 0, "txt": "cat", "vid_id": "vid_bad"}], tok, s,
        num_frm=2, fps=5, max_img_size=448, ensemble_n_clips=1,
        device_preprocess=True)
    item = ds[0]
    assert item["vis"].shape == (2, 64, 64, 3)
    assert "vis_hw" in item
    # host-preprocess path keeps the padded square shape
    ds_host = datasets.VideoRetrievalEvalDataset(
        [{"id": 0, "txt": "cat", "vid_id": "vid_bad"}], tok, s,
        num_frm=2, fps=5, max_img_size=96, ensemble_n_clips=1)
    assert ds_host[0]["vis"].shape == (2, 96, 96, 3)
