"""Oracle detection tests, transliterated 1:1 from the reference suite
(/root/reference/src/lib/__tests__/detection.test.ts:16-441)."""

from sumi_agent_spark.functions.oracle import (
    Detection,
    build_reading_map,
    detect_all,
    detect_custom_keywords,
    detect_japanese_names,
    detect_regex,
    extract_prefecture,
    merge_detections,
    name_to_initial,
    normalize_text,
)


# ─── normalizeText (detection.test.ts:16-36) ───

def test_normalize_fullwidth_digits():
    assert normalize_text("０１２３４５６７８９") == "0123456789"


def test_normalize_fullwidth_letters():
    assert normalize_text("ＡＢＣｘｙｚ") == "ABCxyz"


def test_normalize_keeps_label():
    assert "氏名" in normalize_text("氏名＝太郎")


def test_normalize_collapses_spaces():
    assert normalize_text("hello    world") == "hello world"


def test_normalize_mixed():
    assert normalize_text("電話：０９０−１２３４−５６７８") == "電話：090−1234−5678"


# ─── extractPrefecture (detection.test.ts:39-64) ───

def test_prefectures():
    assert extract_prefecture("北海道札幌市中央区大通西4丁目") == "北海道"
    assert extract_prefecture("東京都渋谷区神宮前3-14-5") == "東京都"
    assert extract_prefecture("大阪府大阪市北区梅田2-5-10") == "大阪府"
    assert extract_prefecture("京都府京都市下京区四条烏丸1-5-3") == "京都府"
    assert extract_prefecture("神奈川県横浜市西区みなとみらい2-3-1") == "神奈川県"
    assert extract_prefecture("千葉県船橋市本町5-7-3") == "千葉県"
    assert extract_prefecture("何もない文字列") == ""


# ─── nameToInitial / buildReadingMap (detection.test.ts:67-109) ───

def test_name_to_initial_katakana():
    assert name_to_initial("タナカ タロウ") == "T.T."


def test_name_to_initial_via_reading_map():
    assert name_to_initial("田中 太郎", {"田中 太郎": "タナカ タロウ"}) == "T.T."


def test_name_to_initial_kanji_fallback():
    assert name_to_initial("佐藤 花子") == "佐.花."


def test_name_to_initial_single_part():
    assert name_to_initial("田中") == "田.中."


def test_name_to_initial_hiragana():
    assert name_to_initial("さくら はな") == "S.H."


def test_name_to_initial_empty():
    assert name_to_initial("") == ""


def test_build_reading_map_basic():
    text = "氏名：田中 太郎\nフリガナ：タナカ タロウ\n生年月日：1990年"
    assert build_reading_map(text)["田中 太郎"] == "タナカ タロウ"


def test_build_reading_map_multiple():
    text = "氏名：佐藤 花子\nフリガナ：サトウ ハナコ\n\n名前：山田 太郎\nフリガナ：ヤマダ タロウ"
    m = build_reading_map(text)
    assert m["佐藤 花子"] == "サトウ ハナコ"
    assert m["山田 太郎"] == "ヤマダ タロウ"


# ─── detectRegex (detection.test.ts:112-199) ───

def _of_type(dets, t):
    return [d for d in dets if d.type == t]


def test_detect_email():
    dets = _of_type(detect_regex("連絡先: tanaka.taro@example.com"), "email")
    assert len(dets) == 1
    assert dets[0].value == "tanaka.taro@example.com"
    assert dets[0].category == "contact"


def test_detect_url():
    dets = _of_type(
        detect_regex("ポートフォリオ：https://tanaka-portfolio.vercel.app/works"), "url")
    assert len(dets) == 1
    assert "https://tanaka-portfolio.vercel.app" in dets[0].value


def test_detect_phone():
    dets = _of_type(detect_regex("電話番号：090-1234-5678"), "phone")
    assert len(dets) == 1
    assert dets[0].value == "090-1234-5678"


def test_phone_no_fp_on_year_range():
    assert _of_type(detect_regex("2020年4月 - 2024年3月"), "phone") == []


def test_detect_postal_with_mark():
    dets = _of_type(detect_regex("〒150-0001"), "postal")
    assert len(dets) == 1
    assert dets[0].value == "〒150-0001"


def test_detect_birthday():
    dets = _of_type(detect_regex("生年月日：1990年4月15日"), "birthday")
    assert len(dets) == 1
    assert dets[0].value == "1990年4月15日"


def test_birthday_skips_doc_date():
    assert _of_type(detect_regex("作成日：2024年12月1日"), "birthday") == []


def test_detect_address():
    dets = _of_type(
        detect_regex("住所：東京都渋谷区神宮前3-14-5 メゾンド原宿 402号室"), "address")
    assert len(dets) >= 1
    assert "東京都" in dets[0].value


def test_detect_name_label():
    assert len(_of_type(detect_regex("氏名：佐藤太郎"), "name_label")) >= 1


def test_detect_mynumber():
    dets = _of_type(detect_regex("マイナンバー：1234 5678 9012"), "mynumber")
    assert len(dets) == 1
    assert dets[0].value == "1234 5678 9012"


def test_detect_name_kana():
    dets = _of_type(detect_regex("フリガナ：タナカ タロウ"), "name_kana")
    assert len(dets) == 1
    assert dets[0].value == "タナカ タロウ"


def test_detect_era_birthday():
    assert len(_of_type(detect_regex("生年月日：昭和63年5月20日"), "birthday")) == 1


def test_birthday_skips_recent_unlabeled():
    assert _of_type(detect_regex("2024年12月1日"), "birthday") == []


# ─── detectJapaneseNames (detection.test.ts:203-236) ───

def test_names_dictionary_full():
    dets = detect_japanese_names("担当：田中 太郎")
    assert len(dets) >= 1
    assert any("田中" in d.value and "太郎" in d.value for d in dets)


def test_names_near_labels():
    dets = detect_japanese_names("上司：鈴木 健太（開発部長）")
    assert len(dets) >= 1
    assert any("鈴木" in d.value for d in dets)


def test_names_not_org():
    dets = detect_japanese_names("株式会社テックフロンティア")
    assert all("株式会社" not in d.value for d in dets if d.category == "name")


def test_names_not_job_titles():
    assert detect_japanese_names("フロントエンドエンジニア") == []


def test_names_multiple():
    dets = detect_japanese_names("担当：佐藤 由美子\n上司：山口 慎一")
    vals = [d.value for d in dets]
    assert any("佐藤" in v for v in vals)
    assert any("山口" in v for v in vals)


# ─── SNS detection (detection.test.ts:239-318) ───

def _has(dets, t, v):
    return any(d.type == t and d.value == v for d in dets)


def test_sns_accounts():
    assert _has(detect_regex("Twitter: @username123"), "sns_twitter", "username123")
    assert _has(detect_regex("ツイッター：@dev_user"), "sns_twitter", "dev_user")
    assert _has(detect_regex("GitHub: @octocat"), "sns_github", "octocat")
    assert _has(detect_regex("GitHub: tanaka-taro-dev"), "sns_github", "tanaka-taro-dev")
    assert _has(detect_regex("LinkedIn: /in/taro-tanaka"), "sns_linkedin", "taro-tanaka")
    assert _has(detect_regex("Instagram: @photo_user"), "sns_instagram", "photo_user")
    assert _has(detect_regex("Facebook: taro.tanaka"), "sns_facebook", "taro.tanaka")
    assert _has(detect_regex("Qiita: tech_writer"), "sns_qiita", "tech_writer")
    assert _has(detect_regex("Dribble: asagiri"), "sns_dribbble", "asagiri")
    assert _has(detect_regex("Zenn: dev_taro"), "sns_zenn", "dev_taro")
    assert _has(detect_regex("LINE ID: taro_123"), "sns_line", "taro_123")
    assert _has(detect_regex("Wantedly: taro-tanaka"), "sns_wantedly", "taro-tanaka")
    assert _has(detect_regex("YouTube: @channel_name"), "sns_youtube", "channel_name")
    assert _has(detect_regex("Bluesky: user.bsky.social"), "sns_bluesky", "user.bsky.social")


def test_sns_not_email():
    dets = detect_regex("連絡先: user@example.com")
    assert not any(d.type.startswith("sns_") for d in dets)


def test_sns_not_url_path():
    dets = detect_regex("https://github.com/octocat")
    assert not any(d.type.startswith("sns_") for d in dets)


# ─── detectAll (detection.test.ts:322-343) ───

def test_detect_all_dedup():
    text = "氏名：田中 太郎\nフリガナ：タナカ タロウ\n電話：090-1234-5678\nメール：tanaka@example.com"
    dets = detect_all(text)
    cats = {d.category for d in dets}
    assert "name" in cats and "contact" in cats
    keys = [f"{d.category}:{d.value}" for d in dets]
    assert len(set(keys)) == len(keys)


def test_detect_all_resume():
    text = ("職務経歴書\n\n氏名：田中 太郎\nフリガナ：タナカ タロウ\n"
            "生年月日：1990年4月15日\n住所：東京都渋谷区神宮前3-14-5 メゾンド原宿 402号室\n"
            "〒150-0001\n電話番号：090-1234-5678\nメール：tanaka.taro@example.com\n"
            "GitHub：https://github.com/tanaka-taro-dev")
    dets = detect_all(text)
    assert len(dets) >= 5
    types = {d.type for d in dets}
    assert {"email", "phone", "url"} <= types


# ─── detectCustomKeywords (detection.test.ts:346-398) ───

def test_custom_single():
    dets = detect_custom_keywords("株式会社テスト商事の田中です", ["株式会社テスト商事"])
    assert len(dets) == 1
    d = dets[0]
    assert (d.value, d.category, d.type, d.confidence) == (
        "株式会社テスト商事", "custom", "custom_keyword", 1.0)


def test_custom_multiple():
    dets = detect_custom_keywords("田中太郎は株式会社ABCで働いています", ["田中太郎", "株式会社ABC"])
    assert sorted(d.value for d in dets) == sorted(["田中太郎", "株式会社ABC"])


def test_custom_dedup():
    assert len(detect_custom_keywords("田中と田中と田中", ["田中"])) == 1


def test_custom_no_match():
    assert detect_custom_keywords("テストテキスト", ["存在しない文字列"]) == []


def test_custom_skips_empty():
    dets = detect_custom_keywords("テスト", ["", " ", "テスト"])
    assert len(dets) == 1
    assert dets[0].value == "テスト"


def test_detect_all_with_custom():
    text = "氏名：田中 太郎\nメール：tanaka@example.com\n所属：カスタム組織名"
    custom = [d for d in detect_all(text, ["カスタム組織名"]) if d.category == "custom"]
    assert len(custom) == 1
    assert custom[0].value == "カスタム組織名"


def test_detect_all_without_custom():
    assert any(d.type == "email" for d in detect_all("tanaka@example.com"))


# ─── mergeDetections (detection.test.ts:401-441) ───

def test_merge_detections():
    base = [Detection("1", "email", "Email", "contact", "a@b.com", "regex", 0.95, True)]
    ai = [
        Detection("2", "email", "Email", "contact", "a@b.com", "ai", 0.9, True),
        Detection("3", "name_ai", "Name", "name", "田中太郎", "ai", 0.95, True),
    ]
    merged = merge_detections(base, ai)
    assert len(merged) == 2
    assert any(d.value == "田中太郎" for d in merged)


def test_role_label_precheck_covers_regex_alternation():
    """The per-row literal precheck that gates NAME_ROLE_LABEL_BEFORE must
    cover every alternation branch of the regex -- a new label added to the
    pattern without updating _ROLE_LABEL_LITS would silently disable the
    context-name fallback for it."""
    import re as _re

    from sumi_agent_spark.functions.oracle import _ROLE_LABEL_LITS
    from sumi_agent_spark.functions.rules import NAME_ROLE_LABEL_BEFORE

    m = _re.match(r"\(\?:(.+?)\)", NAME_ROLE_LABEL_BEFORE.pattern)
    assert m, "pattern no longer starts with a literal alternation"
    branches = m.group(1).split("|")
    for b in branches:
        assert any(lit in b for lit in _ROLE_LABEL_LITS), b
