"""Oracle masking tests, transliterated 1:1 from the reference suite
(/root/reference/src/lib/__tests__/redaction.test.ts:18-224)."""

from sumi_agent_spark.functions.oracle import Detection, apply_redaction
from sumi_agent_spark.functions.rules import PLACEHOLDER_RE, PLACEHOLDERS


def det(value, type_, category, enabled=True):
    return Detection("t", type_, "test", category, value, "regex", 0.95, enabled)


def test_replaces_email():
    out = apply_redaction("連絡先: tanaka@example.com",
                          [det("tanaka@example.com", "email", "contact")])
    assert out == "連絡先: [メール非公開]"


def test_replaces_phone():
    out = apply_redaction("電話：090-1234-5678",
                          [det("090-1234-5678", "phone", "contact")])
    assert out == "電話：[電話番号非公開]"


def test_replaces_name():
    out = apply_redaction("担当：田中 太郎（開発部長）",
                          [det("田中 太郎", "name_dict", "name")])
    assert out == "担当：[氏名非公開]（開発部長）"


def test_replaces_multiple():
    out = apply_redaction(
        "田中太郎 090-1234-5678 tanaka@test.com",
        [det("田中太郎", "name_dict", "name"),
         det("090-1234-5678", "phone", "contact"),
         det("tanaka@test.com", "email", "contact")])
    assert out == "[氏名非公開] [電話番号非公開] [メール非公開]"


def test_skips_disabled():
    out = apply_redaction(
        "田中太郎 090-1234-5678",
        [det("田中太郎", "name_dict", "name", enabled=False),
         det("090-1234-5678", "phone", "contact")])
    assert "田中太郎" in out and "[電話番号非公開]" in out


def test_longest_first():
    out = apply_redaction(
        "住所：東京都渋谷区神宮前3-14-5\n電話：03-1234-5678",
        [det("東京都渋谷区神宮前3-14-5", "address", "address"),
         det("03-1234-5678", "phone", "contact")])
    assert "[住所非公開]" in out and "[電話番号非公開]" in out


def test_all_occurrences():
    out = apply_redaction("田中太郎が発表。田中太郎の意見。",
                          [det("田中太郎", "name_dict", "name")])
    assert out == "[氏名非公開]が発表。[氏名非公開]の意見。"


def test_keep_prefecture_true():
    out = apply_redaction("住所：東京都渋谷区神宮前3-14-5",
                          [det("東京都渋谷区神宮前3-14-5", "address", "address")],
                          keep_prefecture=True)
    assert "東京都" in out and "[住所詳細非公開]" in out and "渋谷区" not in out


def test_keep_prefecture_false():
    out = apply_redaction("東京都渋谷区神宮前3-14-5",
                          [det("東京都渋谷区神宮前3-14-5", "address", "address")],
                          keep_prefecture=False)
    assert out == "[住所非公開]"


def test_name_initial_with_reading():
    out = apply_redaction("氏名：田中 太郎\nフリガナ：タナカ タロウ",
                          [det("田中 太郎", "name_dict", "name")], name_initial=True)
    assert "T.T." in out and "田中 太郎" not in out


def test_name_initial_kanji_fallback():
    out = apply_redaction("佐藤 花子", [det("佐藤 花子", "name_dict", "name")],
                          name_initial=True)
    assert out == "佐.花."


def test_custom_keyword_placeholder():
    out = apply_redaction("所属：株式会社テスト商事 開発部",
                          [det("株式会社テスト商事", "custom_keyword", "custom")])
    assert out == "所属：[指定語非公開] 開発部"


def test_custom_keywords_multiple():
    out = apply_redaction(
        "プロジェクトAとプロジェクトBに参加",
        [det("プロジェクトA", "custom_keyword", "custom"),
         det("プロジェクトB", "custom_keyword", "custom")])
    assert out == "[指定語非公開]と[指定語非公開]に参加"


def test_custom_keyword_all_occurrences():
    out = apply_redaction("ABC社との契約。ABC社へ報告。",
                          [det("ABC社", "custom_keyword", "custom")])
    assert out == "[指定語非公開]との契約。[指定語非公開]へ報告。"


def test_custom_with_other_types():
    out = apply_redaction("田中太郎はABC社に所属",
                          [det("田中太郎", "name_dict", "name"),
                           det("ABC社", "custom_keyword", "custom")])
    assert out == "[氏名非公開]は[指定語非公開]に所属"


def test_custom_disabled():
    out = apply_redaction("秘密のキーワード",
                          [det("秘密のキーワード", "custom_keyword", "custom",
                               enabled=False)])
    assert out == "秘密のキーワード"


def test_placeholder_re_matches_all():
    for ph in ["[メール非公開]", "[URL非公開]", "[電話番号非公開]", "[郵便番号非公開]",
               "[年月日非公開]", "[住所非公開]", "[氏名非公開]", "[番号非公開]",
               "[SNS非公開]", "[組織名非公開]", "[指定語非公開]", "[顔写真削除]",
               "[非公開]"]:
        assert PLACEHOLDER_RE.search(ph), ph


def test_placeholder_re_no_overmatch():
    assert not PLACEHOLDER_RE.search("[普通のテキスト]")


def test_placeholders_cover_types():
    for t in ["email", "url", "phone", "postal", "birthday", "address",
              "name_label", "name_dict", "name_context", "name_ai", "name_kana",
              "sns_ai", "mynumber", "custom_keyword"]:
        assert t in PLACEHOLDERS, t
