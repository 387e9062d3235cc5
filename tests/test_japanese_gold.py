"""Hermetic Japanese reading accuracy on a real-sentence gold set.

The reference always reads Japanese through MeCab
(voice100/japanese/phonemizer.py:355-380); this framework's
``LexiconReader`` (text/japanese/yomi.py + readings.py) must phonemize
everyday text to useful accuracy WITHOUT fugashi (round-2 verdict
item 7: the previous fallback covered ~23 phrases and could not prepare
arbitrary kanji corpora offline). The floors here are pinned against
the embedded jouyou-core tables; MeCab remains the production path.
"""

import difflib

from voice100_tpu.text.japanese import JapanesePhonemizer
from voice100_tpu.text.japanese.kana import hira2kata
from voice100_tpu.text.japanese.yomi import LexiconReader

# (surface, gold katakana reading) — everyday sentences spanning time,
# numbers, verbs with okurigana, jukugo, particles は/へ/を, and the
# domain vocabulary used in the reference's own JA samples.
GOLD_SENTENCES = [
    ("今日は天気がいいですね。", "キョウワテンキガイイデスネ。"),
    ("明日、東京へ行きます。", "アシタ、トウキョウエイキマス。"),
    ("私は日本語を勉強しています。", "ワタシワニホンゴヲベンキョウシテイマス。"),
    ("毎朝七時に起きて、朝御飯を食べます。",
     "マイアサシチジニオキテ、アサゴハンヲタベマス。"),
    ("駅前の図書館で本を読みました。", "エキマエノトショカンデホンヲヨミマシタ。"),
    ("友達と電話で話しました。", "トモダチトデンワデハナシマシタ。"),
    ("この問題はとても難しいです。", "コノモンダイワトテモムズカシイデス。"),
    ("来週の会議の準備をします。", "ライシュウノカイギノジュンビヲシマス。"),
    ("音声認識と音声合成の研究をしています。",
     "オンセイニンシキトオンセイゴウセイノケンキュウヲシテイマス。"),
    ("先生に質問の答えを聞きました。", "センセイニシツモンノコタエヲキキマシタ。"),
    ("家族と一緒に旅行に行きたいです。", "カゾクトイッショニリョコウニイキタイデス。"),
    ("新しい靴を買いました。", "アタラシイクツヲカイマシタ。"),
    ("水を飲んでから、少し休みます。", "ミズヲノンデカラ、スコシヤスミマス。"),
    ("子供たちは公園で遊んでいます。", "コドモタチワコウエンデアソンデイマス。"),
    ("昨日の夜、映画を見ました。", "キノウノヨル、エイガヲミマシタ。"),
    ("電車で会社に通っています。", "デンシャデカイシャニカヨッテイマス。"),
    ("春になると花が咲きます。", "ハルニナルトハナガサキマス。"),
    ("名前を漢字で書いてください。", "ナマエヲカンジデカイテクダサイ。"),
    ("世界の平和を願っています。", "セカイノヘイワヲネガッテイマス。"),
    ("牛乳と卵と野菜を買います。", "ギュウニュウトタマゴトヤサイヲカイマス。"),
    ("病院は銀行の隣にあります。", "ビョウインワギンコウノトナリニアリマス。"),
    ("今年の夏休みは海に行きます。", "コトシノナツヤスミワウミニイキマス。"),
    ("天気予報によると明日は雨です。", "テンキヨホウニヨルトアシタワアメデス。"),
    ("この料理は簡単に作れます。", "コノリョウリワカンタンニツクレマス。"),
    ("日本の文化と歴史に興味があります。",
     "ニホンノブンカトレキシニキョウミガアリマス。"),
    # round-3 extension: sentences composed OUT-OF-GOLD first (the
    # reader scored 3/15 on them before the coverage/okurigana fixes)
    ("新幹線で大阪まで二時間かかります。",
     "シンカンセンデオオサカマデニジカンカカリマス。"),
    ("彼女は英語と中国語が話せます。",
     "カノジョワエイゴトチュウゴクゴガハナセマス。"),
    ("郵便局で切手を三枚買いました。",
     "ユウビンキョクデキッテヲサンマイカイマシタ。"),
    ("週末は部屋の掃除と洗濯をします。",
     "シュウマツワヘヤノソウジトセンタクヲシマス。"),
    ("秋になると紅葉がきれいです。", "アキニナルトコウヨウガキレイデス。"),
    ("風邪を引いたので薬を飲みました。",
     "カゼヲヒイタノデクスリヲノミマシタ。"),
    ("会議は午後三時から始まります。",
     "カイギワゴゴサンジカラハジマリマス。"),
    ("窓を開けて新しい空気を入れます。",
     "マドヲアケテアタラシイクウキヲイレマス。"),
    ("台所で母が夕食を作っています。",
     "ダイドコロデハハガユウショクヲツクッテイマス。"),
    ("地震のときは机の下に隠れてください。",
     "ジシンノトキワツクエノシタニカクレテクダサイ。"),
    ("毎日三十分くらい散歩します。",
     "マイニチサンジュップンクライサンポシマス。"),
    ("このお寺は五百年前に建てられました。",
     "コノオテラワゴヒャクネンマエニタテラレマシタ。"),
    ("兄は大学で物理学を教えています。",
     "アニワダイガクデブツリガクヲオシエテイマス。"),
    ("急いで駅に向かいましたが、電車に乗り遅れました。",
     "イソイデエキニムカイマシタガ、デンシャニノリオクレマシタ。"),
    ("冷蔵庫に牛肉と豚肉が入っています。",
     "レイゾウコニギュウニクトブタニクガハイッテイマス。"),
    # round-3 news/formal register (third out-of-gold probe: 2/12
    # before the suru/na-adjective ON guard and coverage additions)
    ("政府は新しい政策を発表しました。",
     "セイフワアタラシイセイサクヲハッピョウシマシタ。"),
    ("経済の成長が続いています。", "ケイザイノセイチョウガツヅイテイマス。"),
    ("選挙の結果が注目されています。",
     "センキョノケッカガチュウモクサレテイマス。"),
    ("環境問題について議論しました。",
     "カンキョウモンダイニツイテギロンシマシタ。"),
    ("技術の進歩は社会を変えます。", "ギジュツノシンポワシャカイヲカエマス。"),
    ("国際会議が東京で開催されます。",
     "コクサイカイギガトウキョウデカイサイサレマス。"),
    ("警察は事故の原因を調査しています。",
     "ケイサツワジコノゲンインヲチョウサシテイマス。"),
    ("教育制度の改革が必要です。", "キョウイクセイドノカイカクガヒツヨウデス。"),
    ("人口の減少が深刻な問題です。",
     "ジンコウノゲンショウガシンコクナモンダイデス。"),
    ("企業は利益を増やしました。", "キギョウワリエキヲフヤシマシタ。"),
    ("医療費の負担が増加しています。",
     "イリョウヒノフタンガゾウカシテイマス。"),
    ("気温が上昇して農業に影響が出ています。",
     "キオンガジョウショウシテノウギョウニエイキョウガデテイマス。"),
    # round-3 narrative register (fourth out-of-gold probe: 3/10
    # before the iteration-mark kun rule and coverage additions)
    ("昔々、山の上に小さな村がありました。",
     "ムカシムカシ、ヤマノウエニチイサナムラガアリマシタ。"),
    ("少年は森の奥で不思議な光を見つけました。",
     "ショウネンワモリノオクデフシギナヒカリヲミツケマシタ。"),
    ("老人は静かに笑って頷きました。",
     "ロウジンワシズカニワラッテウナズキマシタ。"),
    ("雨の音を聞きながら手紙を書きました。",
     "アメノオトヲキキナガラテガミヲカキマシタ。"),
    ("彼は夢の中で空を飛んでいました。",
     "カレワユメノナカデソラヲトンデイマシタ。"),
    ("月の光が湖の表面を照らしています。",
     "ツキノヒカリガミズウミノヒョウメンヲテラシテイマス。"),
    ("猫は窓辺で丸くなって眠っています。",
     "ネコワマドベデマルクナッテネムッテイマス。"),
    ("遠くの山々が夕日に染まりました。",
     "トオクノヤマヤマガユウヒニソマリマシタ。"),
    ("船は波を越えて島へ向かいました。",
     "フネワナミヲコエテシマエムカイマシタ。"),
    ("庭の花に水をやるのが日課です。",
     "ニワノハナニミズヲヤルノガニッカデス。"),
    # round-3 casual register (fifth out-of-gold probe: 6/10 before)
    ("今週の土曜日、一緒に買い物に行かない？",
     "コンシュウノドヨウビ、イッショニカイモノニイカナイ？"),
    ("昨日の試合、最後まで見た？", "キノウノシアイ、サイゴマデミタ？"),
    ("駅の近くに新しい店ができたよ。",
     "エキノチカクニアタラシイミセガデキタヨ。"),
    ("宿題が終わったら遊びに行こう。",
     "シュクダイガオワッタラアソビニイコウ。"),
    ("電気を消して早く寝なさい。", "デンキヲケシテハヤクネナサイ。"),
    ("お腹が空いたから何か食べたい。",
     "オナカガスイタカラナニカタベタイ。"),
    ("明日の朝、八時に迎えに来てね。",
     "アシタノアサ、ハチジニムカエニキテネ。"),
    ("鍵をどこに置いたか忘れちゃった。",
     "カギヲドコニオイタカワスレチャッタ。"),
    ("風が強いから帽子を押さえて歩いた。",
     "カゼガツヨイカラボウシヲオサエテアルイタ。"),
    ("休みの日は音楽を聴いたり本を読んだりします。",
     "ヤスミノヒワオンガクヲキイタリホンヲヨンダリシマス。"),
    # round-3 mixed register (sixth out-of-gold probe: 4/12 before)
    ("毎週火曜日にピアノを習っています。",
     "マイシュウカヨウビニピアノヲナラッテイマス。"),
    ("黒い雲が出てきたので傘を持って出かけた。",
     "クロイクモガデテキタノデカサヲモッテデカケタ。"),
    ("彼の説明は分かりやすかったです。",
     "カレノセツメイワワカリヤスカッタデス。"),
    ("空港で友人を見送りました。", "クウコウデユウジンヲミオクリマシタ。"),
    ("この道をまっすぐ行くと右側に郵便局があります。",
     "コノミチヲマッスグイクトミギガワニユウビンキョクガアリマス。"),
    ("昼休みに同僚と公園を散歩した。",
     "ヒルヤスミニドウリョウトコウエンヲサンポシタ。"),
    ("祖母は毎晩九時に寝ます。", "ソボワマイバンクジニネマス。"),
    ("強い地震で建物が揺れました。", "ツヨイジシンデタテモノガユレマシタ。"),
    ("新しい技術を学ぶのは楽しいです。",
     "アタラシイギジュツヲマナブノワタノシイデス。"),
    ("冬になると湖が凍ります。", "フユニナルトミズウミガコオリマス。"),
    ("彼女は銀色の時計を身につけていた。",
     "カノジョワギンイロノトケイヲミニツケテイタ。"),
    ("質問があれば遠慮なく聞いてください。",
     "シツモンガアレバエンリョナクキイテクダサイ。"),
    # round-3 seventh probe (6/12 before; 降り始め=オリ kept by policy)
    ("父は毎朝新聞を読みながらコーヒーを飲みます。",
     "チチワマイアサシンブンヲヨミナガラコーヒーヲノミマス。"),
    ("この橋は百年前に造られました。",
     "コノハシワヒャクネンマエニツクラレマシタ。"),
    ("疲れたので温かいお茶を飲んで休みました。",
     "ツカレタノデアタタカイオチャヲノンデヤスミマシタ。"),
    ("電話番号を教えてください。", "デンワバンゴウヲオシエテクダサイ。"),
    ("夏祭りで花火を見ました。", "ナツマツリデハナビヲミマシタ。"),
    ("彼は医者になるために勉強しています。",
     "カレワイシャニナルタメニベンキョウシテイマス。"),
    ("この店のパンは安くておいしいです。",
     "コノミセノパンワヤスクテオイシイデス。"),
    ("荷物を預けてから観光に出かけました。",
     "ニモツヲアズケテカラカンコウニデカケマシタ。"),
    ("冷たい風が北から吹いています。", "ツメタイカゼガキタカラフイテイマス。"),
    ("弟は歌が上手で、よく賞をもらいます。",
     "オトウトワウタガジョウズデ、ヨクショウヲモライマス。"),
    ("図書館で借りた本を明日返します。",
     "トショカンデカリタホンヲアシタカエシマス。"),
    # probe round 9: weather/health/emotion/office
    ("空が青くて雲が白いです。", "ソラガアオクテクモガシロイデス。"),
    ("風が強いので帽子を押さえました。", "カゼガツヨイノデボウシヲオサエマシタ。"),
    ("熱があるので病院へ行きます。", "ネツガアルノデビョウインエイキマス。"),
    ("薬を飲んで早く寝ました。", "クスリヲノンデハヤクネマシタ。"),
    ("歯が痛いので歯医者に行きました。", "ハガイタイノデハイシャニイキマシタ。"),
    ("嬉しい知らせを聞いて涙が出ました。",
     "ウレシイシラセヲキイテナミダガデマシタ。"),
    ("彼は怒って部屋を出て行きました。", "カレワオコッテヘヤヲデテイキマシタ。"),
    ("会議の資料を印刷してください。", "カイギノシリョウヲインサツシテクダサイ。"),
    ("部長に報告書を渡しました。", "ブチョウニホウコクショヲワタシマシタ。"),
    ("給料が上がって嬉しいです。", "キュウリョウガアガッテウレシイデス。"),
    ("秋になると葉が赤くなります。", "アキニナルトハガアカクナリマス。"),
    ("海の近くの温泉に泊まりました。", "ウミノチカクノオンセンニトマリマシタ。"),
    ("お湯が熱いです。", "オユガアツイデス。"),
    ("熱心に勉強します。", "ネッシンニベンキョウシマス。"),
    # probe round 10: shopping/technology/family
    ("財布を忘れたので、お金を借りました。",
     "サイフヲワスレタノデ、オカネヲカリマシタ。"),
    ("値段が高すぎて買えませんでした。", "ネダンガタカスギテカエマセンデシタ。"),
    ("店員さんが親切に説明してくれました。",
     "テンインサンガシンセツニセツメイシテクレマシタ。"),
    ("お釣りは三百円です。", "オツリワサンビャクエンデス。"),
    ("新しい携帯電話を注文しました。",
     "アタラシイケイタイデンワヲチュウモンシマシタ。"),
    ("画面が壊れて修理に出しました。", "ガメンガコワレテシュウリニダシマシタ。"),
    ("祖母は毎週日曜日に教会へ行きます。",
     "ソボワマイシュウニチヨウビニキョウカイエイキマス。"),
    ("兄は大学で物理を教えています。", "アニワダイガクデブツリヲオシエテイマス。"),
    ("妹の誕生日に花束を贈りました。",
     "イモウトノタンジョウビニハナタバヲオクリマシタ。"),
    ("夫婦で近所の店を経営しています。",
     "フウフデキンジョノミセヲケイエイシテイマス。"),
    ("電池が切れたので充電します。", "デンチガキレタノデジュウデンシマス。"),
    ("息子は自転車で学校に通います。",
     "ムスコワジテンシャデガッコウニカヨイマス。"),
    ("八百屋で野菜を買います。", "ヤオヤデヤサイヲカイマス。"),
    ("大通りを通って帰ります。", "オオドオリヲトオッテカエリマス。"),
    # probe round 11: news/sports/music/formal register
    ("首相は記者会見で新しい政策を発表しました。",
     "シュショウワキシャカイケンデアタラシイセイサクヲハッピョウシマシタ。"),
    ("選挙の結果は夜に判明します。", "センキョノケッカワヨルニハンメイシマス。"),
    ("株価が大きく下がりました。", "カブカガオオキクサガリマシタ。"),
    ("警察は事件の原因を調査しています。",
     "ケイサツワジケンノゲンインヲチョウサシテイマス。"),
    ("彼はピアノの練習を毎日続けています。",
     "カレワピアノノレンシュウヲマイニチツヅケテイマス。"),
    ("試合は雨で中止になりました。", "シアイワアメデチュウシニナリマシタ。"),
    ("チームは優勝を目指して頑張っています。",
     "チームワユウショウヲメザシテガンバッテイマス。"),
    ("映画の主人公は若い医者です。", "エイガノシュジンコウワワカイイシャデス。"),
    ("美しい歌声に感動しました。", "ウツクシイウタゴエニカンドウシマシタ。"),
    ("新製品の販売が始まりました。", "シンセイヒンノハンバイガハジマリマシタ。"),
    ("契約の内容を確認してください。", "ケイヤクノナイヨウヲカクニンシテクダサイ。"),
    ("空港で荷物を預けました。", "クウコウデニモツヲアズケマシタ。"),
    ("相手の話をよく聞きます。", "アイテノハナシヲヨクキキマス。"),
    ("話せば分かります。", "ハナセバワカリマス。"),
    # round-3 health/nature/directions register (twelfth out-of-gold
    # probe: 10/12 before the 降る=フ variants and the 訪 entries)
    ("病気になったので、薬を飲みました。",
     "ビョウキニナッタノデ、クスリヲノミマシタ。"),
    ("庭に小さな鳥が来ました。", "ニワニチイサナトリガキマシタ。"),
    ("野菜を切って、鍋に入れてください。",
     "ヤサイヲキッテ、ナベニイレテクダサイ。"),
    ("次の角を右に曲がってください。",
     "ツギノカドヲミギニマガッテクダサイ。"),
    ("彼の意見に賛成です。", "カレノイケンニサンセイデス。"),
    ("空港までタクシーで三十分かかります。",
     "クウコウマデタクシーデサンジュップンカカリマス。"),
    ("天気予報によると、午後から雨が降るそうです。",
     "テンキヨホウニヨルト、ゴゴカラアメガフルソウデス。"),
    ("荷物が重いので、手伝ってもらえますか。",
     "ニモツガオモイノデ、テツダッテモラエマスカ。"),
    ("約束の時間に遅れてすみません。",
     "ヤクソクノジカンニオクレテスミマセン。"),
    ("海の近くの町で生まれました。", "ウミノチカクノマチデウマレマシタ。"),
    ("夏休みに祖父母の家を訪ねる予定です。",
     "ナツヤスミニソフボノイエヲタズネルヨテイデス。"),
    ("彼女は歌が上手で、声がきれいです。",
     "カノジョワウタガジョウズデ、コエガキレイデス。"),
    # 降る (fall) vs 降りる (get off) vs 降ろす (unload); 訪ねる/訪れる
    ("雪が降っています。", "ユキガフッテイマス。"),
    ("バスを降りました。", "バスヲオリマシタ。"),
    ("荷物を降ろします。", "ニモツヲオロシマス。"),
    ("春が訪れました。", "ハルガオトズレマシタ。"),
    ("先生を訪問します。", "センセイヲホウモンシマス。"),
    # round-3 sports/medical/keigo register (thirteenth out-of-gold
    # probe: 7/12 before 射/干, the 様 honorific compounds, and the
    # run-initial demonstrative+particle pass こちらへ/これは)
    ("毎朝三十分走っています。", "マイアササンジュップンハシッテイマス。"),
    ("チームの練習は夕方六時からです。",
     "チームノレンシュウワユウガタロクジカラデス。"),
    ("頭が痛いので病院へ行きます。",
     "アタマガイタイノデビョウインエイキマス。"),
    ("注射は少し痛かったです。", "チュウシャワスコシイタカッタデス。"),
    ("少々お待ちください。", "ショウショウオマチクダサイ。"),
    ("お客様、こちらへどうぞ。", "オキャクサマ、コチラエドウゾ。"),
    ("ご注文はお決まりですか。", "ゴチュウモンワオキマリデスカ。"),
    ("資料を明日までに送ってください。",
     "シリョウヲアシタマデニオクッテクダサイ。"),
    ("会議室の予約をお願いします。",
     "カイギシツノヨヤクヲオネガイシマス。"),
    ("洗濯物を干してから出かけました。",
     "センタクモノヲホシテカラデカケマシタ。"),
    ("冷蔵庫に牛乳が残っています。",
     "レイゾウコニギュウニュウガノコッテイマス。"),
    ("髪を切ってもらいました。", "カミヲキッテモライマシタ。"),
    ("これはいいですね。", "コレワイイデスネ。"),
    ("どこへ行きますか。", "ドコエイキマスカ。"),
    ("皆様にご挨拶します。", "ミナサマニゴアイサツシマス。"),
    # round-3 conjugation/news/quantity register (fourteenth
    # out-of-gold probe: 9/12 before 状況/善/個 entries, the
    # ON-prefix-before-katakana rule, and the 半分 compound)
    ("今日は何も食べなかった。", "キョウワナニモタベナカッタ。"),
    ("早く行こうと思います。", "ハヤクイコウトオモイマス。"),
    ("彼は何も言わずに帰った。", "カレワナニモイワズニカエッタ。"),
    ("字が小さくて読めません。", "ジガチイサクテヨメマセン。"),
    ("時間がないから急ごう。", "ジカンガナイカライソゴウ。"),
    ("政府は新しい政策を発表した。",
     "セイフワアタラシイセイサクヲハッピョウシタ。"),
    ("事故の原因を調査しています。",
     "ジコノゲンインヲチョウサシテイマス。"),
    ("台風の影響で電車が止まった。",
     "タイフウノエイキョウデデンシャガトマッタ。"),
    ("経済の状況が改善しました。",
     "ケイザイノジョウキョウガカイゼンシマシタ。"),
    ("りんごを三個と卵を一パック買った。",
     "リンゴヲサンコトタマゴヲイチパックカッタ。"),
    ("全部で二千三百円です。", "ゼンブデニセンサンビャクエンデス。"),
    ("半分に切って分けましょう。", "ハンブンニキッテワケマショウ。"),
    ("新サービスが始まった。", "シンサービスガハジマッタ。"),
    ("十分に休みました。", "ジュウブンニヤスミマシタ。"),
    # round-3 era-name/keigo register (fifteenth out-of-gold probe:
    # 2/6 before the 和/卒/昭/召/伺 entries)
    ("令和六年に卒業しました。", "レイワロクネンニソツギョウシマシタ。"),
    ("昭和の時代の音楽が好きです。",
     "ショウワノジダイノオンガクガスキデス。"),
    ("平成三十年です。", "ヘイセイサンジュウネンデス。"),
    ("先生がいらっしゃいます。", "センセイガイラッシャイマス。"),
    ("どうぞ召し上がってください。", "ドウゾメシアガッテクダサイ。"),
    ("お名前を伺います。", "オナマエヲウカガイマス。"),
    # round-3 passive/causative register (sixteenth out-of-gold probe:
    # 10/12 blind before the 困/盗 entries)
    ("先生に褒められました。", "センセイニホメラレマシタ。"),
    ("母に野菜を食べさせられた。", "ハハニヤサイヲタベサセラレタ。"),
    ("雨に降られて困りました。", "アメニフラレテコマリマシタ。"),
    ("犬に手を噛まれた。", "イヌニテヲカマレタ。"),
    ("部長に呼ばれて会議室へ行った。",
     "ブチョウニヨバレテカイギシツエイッタ。"),
    ("子供に泣かれて眠れなかった。", "コドモニナカレテネムレナカッタ。"),
    ("先生が生徒に本を読ませた。", "センセイガセイトニホンヲヨマセタ。"),
    ("荷物を持たせてください。", "ニモツヲモタセテクダサイ。"),
    ("写真を撮られるのが嫌いです。", "シャシンヲトラレルノガキライデス。"),
    ("駅で財布を盗まれました。", "エキデサイフヲヌスマレマシタ。"),
    ("みんなに愛される人になりたい。", "ミンナニアイサレルヒトニナリタイ。"),
    # round-3 blind measurement round (eighteenth probe: 14/20 before
    # 貼/留/流/冗/談, 変な=ヘン vs 変わる=カ, and the 夜中/水分/作業
    # compounds)
    ("弟は自転車で学校に通っています。",
     "オトウトワジテンシャデガッコウニカヨッテイマス。"),
    ("今夜は星がきれいに見えます。", "コンヤワホシガキレイニミエマス。"),
    ("彼は有名な作家になりました。", "カレワユウメイナサッカニナリマシタ。"),
    ("手紙に切手を貼って出しました。",
     "テガミニキッテヲハッテダシマシタ。"),
    ("夜中に変な音が聞こえた。", "ヨナカニヘンナオトガキコエタ。"),
    ("道に迷って遅刻しました。", "ミチニマヨッテチコクシマシタ。"),
    ("木の枝に鳥が止まっている。", "キノエダニトリガトマッテイル。"),
    ("机の上に眼鏡を置いた。", "ツクエノウエニメガネヲオイタ。"),
    ("暑い日は水分を取りましょう。", "アツイヒワスイブンヲトリマショウ。"),
    ("彼は自信を持って発言した。", "カレワジシンヲモッテハツゲンシタ。"),
    ("新しい橋の建設が進んでいる。",
     "アタラシイハシノケンセツガススンデイル。"),
    ("留学生と文化交流をしました。",
     "リュウガクセイトブンカコウリュウヲシマシタ。"),
    ("夕方になると空が赤く染まる。", "ユウガタニナルトソラガアカクソマル。"),
    ("彼の冗談にみんなが笑った。", "カレノジョウダンニミンナガワラッタ。"),
    ("図面を確認してから作業を始める。",
     "ズメンヲカクニンシテカラサギョウヲハジメル。"),
    ("電池が切れたので交換した。", "デンチガキレタノデコウカンシタ。"),
    ("社会を変えます。", "シャカイヲカエマス。"),
    ("色が変わりました。", "イロガカワリマシタ。"),
    ("五分待ってください。", "ゴフンマッテクダサイ。"),
    ("気分がいいです。", "キブンガイイデス。"),
    # round-3 recipe/business-mail register (nineteenth out-of-gold
    # probe: 4/12 before 玉/振/煮/完/添/訳/程, the 認 okurigana keying,
    # 十分+duration-suffix, and the 胡椒/弱火/何卒/煮込/間違 compounds)
    ("玉ねぎを薄く切ります。", "タマネギヲウスクキリマス。"),
    ("肉に塩と胡椒を振ってください。",
     "ニクニシオトコショウヲフッテクダサイ。"),
    ("鍋に油を入れて温めます。", "ナベニアブラヲイレテアタタメマス。"),
    ("弱火で十分ほど煮込みます。", "ヨワビデジュップンホドニコミマス。"),
    ("最後に醤油を加えて完成です。",
     "サイゴニショウユヲクワエテカンセイデス。"),
    ("ご連絡ありがとうございます。", "ゴレンラクアリガトウゴザイマス。"),
    ("お世話になっております。", "オセワニナッテオリマス。"),
    ("添付の資料をご確認ください。",
     "テンプノシリョウヲゴカクニンクダサイ。"),
    ("何卒よろしくお願いいたします。",
     "ナニトゾヨロシクオネガイイタシマス。"),
    ("返信が遅くなり申し訳ありません。",
     "ヘンシンガオソクナリモウシワケアリマセン。"),
    ("会議の日程を変更しました。", "カイギノニッテイヲヘンコウシマシタ。"),
    ("間違いを認めました。", "マチガイヲミトメマシタ。"),
    ("十分後に出発します。", "ジュップンゴニシュッパツシマス。"),
    ("人間の時間と空間。", "ニンゲンノジカントクウカン。"),
    # round-3 hobbies/animals register (twentieth out-of-gold probe:
    # 7/12 before 登/兎/周/展/素 and the 登山/素晴らし compounds)
    ("趣味は写真を撮ることです。", "シュミワシャシンヲトルコトデス。"),
    ("週末に釣りに行きます。", "シュウマツニツリニイキマス。"),
    ("動物園でパンダを見た。", "ドウブツエンデパンダヲミタ。"),
    ("猿が木に登っている。", "サルガキニノボッテイル。"),
    ("兎は速く走ります。", "ウサギワハヤクハシリマス。"),
    ("蝶が花の周りを飛んでいる。", "チョウガハナノマワリヲトンデイル。"),
    ("亀はゆっくり歩く。", "カメワユックリアルク。"),
    ("熊が山に現れた。", "クマガヤマニアラワレタ。"),
    ("切符を二枚買いました。", "キップヲニマイカイマシタ。"),
    ("展覧会の絵が素晴らしかった。",
     "テンランカイノエガスバラシカッタ。"),
    ("登山の装備を準備する。", "トザンノソウビヲジュンビスル。"),
    ("湖で白鳥を見ました。", "ミズウミデハクチョウヲミマシタ。"),
    # round-3 relationships/idioms register (twenty-first out-of-gold
    # probe: 7/12 before 仲/堅, 目上/年上/従兄弟/仲良 compounds, and the
    # 空く=アク default with 腹が空く=スク lexicalized)
    ("彼とは長い付き合いです。", "カレトワナガイツキアイデス。"),
    ("隣の家族と仲良くしています。",
     "トナリノカゾクトナカヨクシテイマス。"),
    ("腹が立って眠れなかった。", "ハラガタッテネムレナカッタ。"),
    ("目上の人には敬語を使います。",
     "メウエノヒトニワケイゴヲツカイマス。"),
    ("心配をかけてすみません。", "シンパイヲカケテスミマセン。"),
    ("彼は口が堅い人です。", "カレワクチガカタイヒトデス。"),
    ("手が空いたら手伝います。", "テガアイタラテツダイマス。"),
    ("顔が広い先輩に紹介してもらった。",
     "カオガヒロイセンパイニショウカイシテモラッタ。"),
    ("息子の成長が楽しみです。", "ムスコノセイチョウガタノシミデス。"),
    ("年上の従兄弟がいます。", "トシウエノイトコガイマス。"),
    ("席が空きました。", "セキガアキマシタ。"),
    ("二人は仲良しです。", "フタリワナカヨシデス。"),
    # round-3 work/school/housework register (twenty-second
    # out-of-gold probe: 9/12 blind before 履/喋 and 片付=カタヅ)
    ("面接の結果を待っています。", "メンセツノケッカヲマッテイマス。"),
    ("履歴書を書き直しました。", "リレキショヲカキナオシマシタ。"),
    ("残業が多くて疲れました。", "ザンギョウガオオクテツカレマシタ。"),
    ("部屋を片付けてから寝ます。", "ヘヤヲカタヅケテカラネマス。"),
    ("床を拭いて窓を磨いた。", "ユカヲフイテマドヲミガイタ。"),
    ("布団を干しました。", "フトンヲホシマシタ。"),
    ("毎日日記を付けています。", "マイニチニッキヲツケテイマス。"),
    ("漢字の読み方を覚えます。", "カンジノヨミカタヲオボエマス。"),
    ("先生の授業は分かりやすい。", "センセイノジュギョウワワカリヤスイ。"),
    ("黒板の字を写しました。", "コクバンノジヲウツシマシタ。"),
    ("休み時間に友達と喋った。", "ヤスミジカンニトモダチトシャベッタ。"),
    ("靴を履きました。", "クツヲハキマシタ。"),
    # round-3 ceremonies/banking/emergencies register (twenty-third
    # out-of-gold probe: 7/12 before 郎/訓/練, 従姉/怪我 compounds, and
    # the を-conditioned 開く=ヒラク transitive split)
    ("従姉の結婚式に出席しました。",
     "イトコノケッコンシキニシュッセキシマシタ。"),
    ("新郎新婦が入場しました。", "シンロウシンプガニュウジョウシマシタ。"),
    ("銀行で口座を開きました。", "ギンコウデコウザヲヒラキマシタ。"),
    ("現金で支払いました。", "ゲンキンデシハライマシタ。"),
    ("毎月貯金しています。", "マイツキチョキンシテイマス。"),
    ("利子が付く預金口座です。", "リシガツクヨキンコウザデス。"),
    ("火事で建物が燃えました。", "カジデタテモノガモエマシタ。"),
    ("消防車がすぐに来ました。", "ショウボウシャガスグニキマシタ。"),
    ("救急車を呼んでください。", "キュウキュウシャヲヨンデクダサイ。"),
    ("避難訓練を行いました。", "ヒナンクンレンヲオコナイマシタ。"),
    ("怪我人を助けました。", "ケガニンヲタスケマシタ。"),
    ("警報が鳴って驚いた。", "ケイホウガナッテオドロイタ。"),
    ("ドアが開きました。", "ドアガアキマシタ。"),
    ("本を開く。", "ホンヲヒラク。"),
    # round-3 weather/disaster + technology register (twenty-fourth
    # out-of-gold probe: 9/12 blind before kanji-numeral counters
    # (三十五度), 津波, and 懐 entries)
    ("台風が近づいています。", "タイフウガチカヅイテイマス。"),
    ("地震の時は机の下に隠れてください。",
     "ジシンノトキワツクエノシタニカクレテクダサイ。"),
    ("明日は雨が降るそうです。", "アシタワアメガフルソウデス。"),
    ("気温が三十五度まで上がりました。",
     "キオンガサンジュウゴドマデアガリマシタ。"),
    ("津波警報が出ました。", "ツナミケイホウガデマシタ。"),
    ("停電に備えて懐中電灯を用意する。",
     "テイデンニソナエテカイチュウデントウヲヨウイスル。"),
    ("インターネットで調べてみます。", "インターネットデシラベテミマス。"),
    ("パスワードを忘れてしまいました。",
     "パスワードヲワスレテシマイマシタ。"),
    ("携帯電話の電池が切れそうです。",
     "ケイタイデンワノデンチガキレソウデス。"),
    ("新しいアプリを入れました。", "アタラシイアプリヲイレマシタ。"),
    ("画面が突然消えた。", "ガメンガトツゼンキエタ。"),
    ("雪で電車が遅れています。", "ユキデデンシャガオクレテイマス。"),
    # kanji-numeral counter paradigms (ASCII twins already covered by
    # the counter spot-suite): compound-at-counter splitting and the
    # ordinal 目
    ("九時に起きた。", "クジニオキタ。"),
    ("三回目です。", "サンカイメデス。"),
    ("四年前のこと。", "ヨネンマエノコト。"),
    ("三時間かかる。", "サンジカンカカル。"),
    ("一万二千円払った。", "イチマンニセンエンハラッタ。"),
    ("三日目の朝。", "ミッカメノアサ。"),
    ("二人で行く。", "フタリデイク。"),
    # round-3 travel / sightseeing register (twenty-fifth out-of-gold
    # probe: 9/12 blind before the 菓/望/景/眺 entries and the
    # 土産/景色 jukujikun, 地元 ON+kun, 窓側 kun-kun-rendaku compounds)
    ("空港からホテルまでタクシーで行きました。",
     "クウコウカラホテルマデタクシーデイキマシタ。"),
    ("この道をまっすぐ進んで、二つ目の角を右に曲がってください。",
     "コノミチヲマッスグススンデ、フタツメノカドヲミギニマガッテクダサイ。"),
    ("切符売り場はどこですか。", "キップウリバワドコデスカ。"),
    ("荷物を預けてから観光に出かけます。",
     "ニモツヲアズケテカラカンコウニデカケマス。"),
    ("地図を見ながら美術館を探しました。",
     "チズヲミナガラビジュツカンヲサガシマシタ。"),
    ("温泉に入って疲れを取りました。", "オンセンニハイッテツカレヲトリマシタ。"),
    ("お土産に地元のお菓子を買いました。",
     "オミヤゲニジモトノオカシヲカイマシタ。"),
    ("船で島を渡りました。", "フネデシマヲワタリマシタ。"),
    ("窓側の席を予約しました。", "マドガワノセキヲヨヤクシマシタ。"),
    ("出発の時刻を確認してください。",
     "シュッパツノジコクヲカクニンシテクダサイ。"),
    ("道に迷ったので交番で聞きました。",
     "ミチニマヨッタノデコウバンデキキマシタ。"),
    ("展望台から街の景色を眺めました。",
     "テンボウダイカラマチノケシキヲナガメマシタ。"),
    # round-3 shopping / clothing register (twenty-sixth out-of-gold
    # probe: 8/12 blind before the 額/季/節/割 entries, the
    # 半額/色違い/割引/大売り出し compounds, and the 足 counter
    # paradigm with its サンゾク rendaku)
    ("このシャツを試着してもいいですか。", "コノシャツヲシチャクシテモイイデスカ。"),
    ("値段が高すぎるので、安い物を探します。",
     "ネダンガタカスギルノデ、ヤスイモノヲサガシマス。"),
    ("全品半額の大売り出しです。", "ゼンピンハンガクノオオウリダシデス。"),
    ("このズボンは少し短いです。", "コノズボンワスコシミジカイデス。"),
    ("色違いの靴下を三足ください。",
     "イロチガイノクツシタヲサンゾククダサイ。"),
    ("現金で払いますか、カードで払いますか。",
     "ゲンキンデハライマスカ、カードデハライマスカ。"),
    ("袋に入れてください。", "フクロニイレテクダサイ。"),
    ("返品はレシートが必要です。", "ヘンピンワレシートガヒツヨウデス。"),
    ("店員さんにサイズを聞きました。", "テンインサンニサイズヲキキマシタ。"),
    ("季節の商品が並んでいます。", "キセツノショウヒンガナランデイマス。"),
    ("割引券を使って買い物をしました。",
     "ワリビキケンヲツカッテカイモノヲシマシタ。"),
    ("品質がいいので長く使えます。", "ヒンシツガイイノデナガクツカエマス。"),
    # round-3 restaurant / food-ordering register (twenty-seventh
    # out-of-gold probe: 7/12 blind before 何+copula=ナン, 空く=アク,
    # the 腐 entry, and the 焼き魚/昼御飯/蕎麦 compounds)
    ("この店の予約をお願いします。", "コノミセノヨヤクヲオネガイシマス。"),
    ("おすすめの料理は何ですか。", "オススメノリョウリワナンデスカ。"),
    ("注文を変更してもいいですか。", "チュウモンヲヘンコウシテモイイデスカ。"),
    ("焼き魚定食を二つください。", "ヤキザカナテイショクヲフタツクダサイ。"),
    ("辛い物が苦手です。", "カライモノガニガテデス。"),
    ("お会計は別々にお願いします。", "オカイケイワベツベツニオネガイシマス。"),
    ("飲み物は後で持ってきてください。",
     "ノミモノワアトデモッテキテクダサイ。"),
    ("この豆腐料理は豆乳から作られています。",
     "コノトウフリョウリワトウニュウカラツクラレテイマス。"),
    ("席が空くまで三十分待ちました。",
     "セキガアクマデサンジュップンマチマシタ。"),
    ("熱いお茶と冷たい水をください。", "アツイオチャトツメタイミズヲクダサイ。"),
    ("昼御飯に蕎麦を食べました。", "ヒルゴハンニソバヲタベマシタ。"),
    ("塩と胡椒を少々加えます。", "シオトコショウヲショウショウクワエマス。"),
    # round-3 moving-house / directions register (twenty-eighth
    # out-of-gold probe: 6/12 blind before 家賃/大家/手前 compounds,
    # the 詰/具/荷 entries, and the 着く=ツ vs 着る=キ okurigana split)
    ("新しい部屋に引っ越しました。", "アタラシイヘヤニヒッコシマシタ。"),
    ("家賃は月に八万円です。", "ヤチンワツキニハチマンエンデス。"),
    ("荷物を箱に詰めて運びます。", "ニモツヲハコニツメテハコビマス。"),
    ("二階の窓から海が見えます。", "ニカイノマドカラウミガミエマス。"),
    ("家具を組み立てるのに時間がかかりました。",
     "カグヲクミタテルノニジカンガカカリマシタ。"),
    ("大家さんに鍵を返しました。", "オオヤサンニカギヲカエシマシタ。"),
    ("交差点を右に曲がってください。", "コウサテンヲミギニマガッテクダサイ。"),
    ("信号の手前で止まります。", "シンゴウノテマエデトマリマス。"),
    ("この道をまっすぐ行くと駅に着きます。",
     "コノミチヲマッスグイクトエキニツキマス。"),
    ("橋を渡って左側の建物です。", "ハシヲワタッテヒダリガワノタテモノデス。"),
    ("地図を見ながら歩きました。", "チズヲミナガラアルキマシタ。"),
    ("角の店の前で待っています。", "カドノミセノマエデマッテイマス。"),
    ("新しい服を着ています。", "アタラシイフクヲキテイマス。"),
    ("九時に空港に着いた。", "クジニクウコウニツイタ。"),
    ("体の具合が悪いです。", "カラダノグアイガワルイデス。"),
    ("道具を使って缶詰を開けました。", "ドウグヲツカッテカンヅメヲアケマシタ。"),
    # round-3 post-office / delivery / phone register (twenty-ninth
    # out-of-gold probe: 5/12 blind before the 配/封/筒 entries and the
    # 小包/留守/葉書/伝言 compounds)
    ("郵便局で切手を買いました。", "ユウビンキョクデキッテヲカイマシタ。"),
    ("小包を送りたいのですが。", "コヅツミヲオクリタイノデスガ。"),
    ("宅配便が午後に届きます。", "タクハイビンガゴゴニトドキマス。"),
    ("封筒に住所を書いてください。", "フウトウニジュウショヲカイテクダサイ。"),
    ("留守番電話にメッセージを残しました。",
     "ルスバンデンワニメッセージヲノコシマシタ。"),
    ("電話番号を間違えました。", "デンワバンゴウヲマチガエマシタ。"),
    ("葉書を三枚ください。", "ハガキヲサンマイクダサイ。"),
    ("速達でお願いします。", "ソクタツデオネガイシマス。"),
    ("受付で名前を呼ばれました。", "ウケツケデナマエヲヨバレマシタ。"),
    ("伝言をお願いできますか。", "デンゴンヲオネガイデキマスカ。"),
    ("配達の時間を変更したいです。", "ハイタツノジカンヲヘンコウシタイデス。"),
    ("印鑑を押してください。", "インカンヲオシテクダサイ。"),
    ("友達にお菓子を配りました。", "トモダチニオカシヲクバリマシタ。"),
    ("竹の筒に水を入れました。", "タケノツツニミズヲイレマシタ。"),
    ("手紙を封筒に入れて出しました。", "テガミヲフウトウニイレテダシマシタ。"),
    # round-3 school-life / exams register (thirtieth out-of-gold
    # probe: 11/12 blind; only the 替 entry was missing)
    ("来月、入学試験があります。", "ライゲツ、ニュウガクシケンガアリマス。"),
    ("合格発表は金曜日です。", "ゴウカクハッピョウワキンヨウビデス。"),
    ("息子は算数が得意です。", "ムスコワサンスウガトクイデス。"),
    ("宿題を忘れて先生に叱られました。",
     "シュクダイヲワスレテセンセイニシカラレマシタ。"),
    ("黒板の字が見えません。", "コクバンノジガミエマセン。"),
    ("卒業式で歌を歌いました。", "ソツギョウシキデウタヲウタイマシタ。"),
    ("試験の結果が心配です。", "シケンノケッカガシンパイデス。"),
    ("鉛筆と消しゴムを忘れました。", "エンピツトケシゴムヲワスレマシタ。"),
    ("休み時間に友達と遊びました。", "ヤスミジカンニトモダチトアソビマシタ。"),
    ("制服を着て学校に行きます。", "セイフクヲキテガッコウニイキマス。"),
    ("辞書で言葉の意味を調べました。", "ジショデコトバノイミヲシラベマシタ。"),
    ("教室の窓を開けて空気を入れ替えました。",
     "キョウシツノマドヲアケテクウキヲイレカエマシタ。"),
    ("銀行で両替をしました。", "ギンコウデリョウガエヲシマシタ。"),
    ("服を着替えてから出かけます。", "フクヲキガエテカラデカケマス。"),
]


def _read(reader, text):
    return hira2kata("".join(y or w for w, y in reader.tokens(text)))


def test_lexicon_reader_gold_floor():
    """Char-level accuracy >= 0.97 and sentence-exact >= 0.90 on the
    gold set, using the hermetic reader explicitly (no fugashi).
    Measured 95/95 exact after the round-3 fixes: whole-run compound
    matching (a leading compound no longer strands the run's last
    kanji as a false isolated-kun: 物理+学, 二時+間), okurigana-keyed
    kun stems (KUN_OKURI: 開けて=ア vs 開く=ヒラ, 入れ=イ,
    遅れ=オク, 通って=カヨ), the numeric 分 counter
    (三十分=サンジュップン), and the coverage additions in
    readings.py."""
    reader = LexiconReader()
    tot = hit = exact = 0
    for text, gold in GOLD_SENTENCES:
        got = _read(reader, text)
        sm = difflib.SequenceMatcher(a=gold, b=got)
        hit += sum(b.size for b in sm.get_matching_blocks())
        tot += max(len(gold), len(got))
        exact += int(got == gold)
    assert hit / tot >= 0.97, f"char accuracy {hit / tot:.4f}"
    assert exact >= int(0.90 * len(GOLD_SENTENCES)), (
        f"sentence-exact {exact}/{len(GOLD_SENTENCES)}"
    )


def test_particles_and_okurigana():
    reader = LexiconReader()
    # topic は in leading / trailing run positions; directional へ
    assert _read(reader, "私は行く") == "ワタシワイク"
    assert _read(reader, "子供たちは遊ぶ") == "コドモタチワアソブ"
    assert _read(reader, "学校へ行く") == "ガッコウエイク"
    # okurigana selects the kun stem; jukugo stay on
    assert _read(reader, "食べる") == "タベル"
    assert _read(reader, "電車") == "デンシャ"
    # iteration mark repeats via the compound table
    assert _read(reader, "人々") == "ヒトビト"


def test_no_single_kanji_compound_entries():
    """Single-kanji readings belong in KUN/ON, never in COMPOUNDS:
    a one-char compound wins longest-match before the kun/on context
    logic, breaking every unlisted jukugo containing that kanji
    (regression: 十年 -> トオトシ instead of ジュウネン)."""
    from voice100_tpu.text.japanese.readings import COMPOUNDS

    bad = [k for k in COMPOUNDS if len(k) == 1]
    assert not bad, bad


def test_unlisted_jukugo_take_on_readings():
    reader = LexiconReader()
    cases = {
        "十年": "ジュウネン",
        "五十": "ゴジュウ",
        # ランパク exercises the post-nasal h->p euphony rule
        # (yomi._euphonic_join) on top of plain on-concatenation
        "卵白": "ランパク",
        "隣人": "リンジン",
    }
    for surface, want in cases.items():
        assert _read(reader, surface) == want, surface


def test_noun_particle_vs_okurigana():
    """A multi-kanji run ending right before a particle/copula is a
    jukugo noun (final kanji reads ON); before an inflection it is a
    verb stem (final kanji keeps KUN). The pre-fix behavior read
    発表は as ハツ+オモテ+ワ."""
    reader = LexiconReader()
    cases = {
        "発表は": "ハッピョウワ",   # は topic marker, not okurigana
        "卵白を": "ランパクヲ",
        "一杯の": "イッパイノ",
        "心配な": "シンパイナ",
        "学生だ": "ガクセイダ",
        "手伝う": "テツダウ",       # u-inflection: kun stem survives
        "見送る": "ミオクル",
    }
    for surface, want in cases.items():
        assert _read(reader, surface) == want, (
            surface, _read(reader, surface))


def test_jukugo_euphony():
    """Sokuonbin gemination and post-nasal hardening at on-on
    boundaries (MeCab reads whole words; the hermetic fallback must
    apply the productive sound changes itself)."""
    reader = LexiconReader()
    cases = {
        "一体": "イッタイ",    # chi + t -> geminate
        "発見": "ハッケン",    # tsu + k -> geminate
        "発表": "ハッピョウ",  # tsu + h -> geminate + p-row
        "失敗": "シッパイ",
        "国家": "コッカ",      # ku + k -> geminate
        "物質": "ブッシツ",    # tsu + s -> geminate
        "鉛筆": "エンピツ",    # n + h -> p-row
        "何分": "ナンプン",
        "先輩": "センパイ",
        # guards: no over-application
        "地点": "チテン",      # single-mora チ never geminates
        "告白": "コクハク",    # ku only geminates before k-row
        "突然": "トツゼン",    # voiced head: no change
    }
    for surface, want in cases.items():
        assert _read(reader, surface) == want, (
            surface, _read(reader, surface))


def test_gold_sentences_phonemize_end_to_end():
    """Every gold sentence must survive the full phonemizer: non-empty
    phone output containing no raw kanji (nothing unreadable leaked
    through to the vocabulary filter)."""
    ph = JapanesePhonemizer()
    for text, _ in GOLD_SENTENCES:
        out = ph(text)
        assert out, text
        assert not any("一" <= ch <= "鿯" for ch in out), (
            text, out)


def test_ascii_numbers_and_counters():
    """ASCII digit runs read as Japanese cardinals; digit+counter
    pairs use the irregular counter paradigms with standard euphony
    (text/japanese/numbers.py). MeCab handles these in the reference;
    the fallback previously dropped digits and misread the counter as
    isolated kun (2026年 -> トシ)."""
    reader = LexiconReader()
    cases = {
        "2026年8月18日の午後3時30分です。":
            "ニセンニジュウロクネンハチガツジュウハチニチ"
            "ノゴゴサンジサンジュップンデス。",
        "1人で3時間待ちました。": "ヒトリデサンジカンマチマシタ。",
        "りんごを6個と本を2冊買いました。":
            "リンゴヲロッコトホンヲニサツカイマシタ。",
        "彼は20歳で、弟は8歳です。": "カレワハタチデ、オトウトワハッサイデス。",
        "100円のパンを4月1日に買った。":
            "ヒャクエンノパンヲシガツツイタチニカッタ。",
        "3本のペンと1匹の犬。": "サンボンノペントイッピキノイヌ。",
        "10分だけ待って。": "ジュップンダケマッテ。",
        "10000人が集まった。": "イチマンニンガアツマッタ。",
        "0時です。": "ゼロジデス。",
    }
    for surface, want in cases.items():
        assert _read(reader, surface) == want, (
            surface, _read(reader, surface))


def test_number_reader_total_and_katakana():
    """read_number is total over its domain and emits pure katakana
    (property check; the phonemizer downstream can read any output)."""
    import re

    from voice100_tpu.text.japanese.numbers import read_number

    kata = re.compile(r"^[ァ-ヶー]+$")
    for n in list(range(0, 130)) + [999, 1000, 3600, 8000, 10000,
                                    65536, 123456789, 10**9]:
        got = read_number(str(n))
        assert got and kata.match(got), (n, got)
    # digit-by-digit fallback for phone-number-length runs
    assert read_number("09012345678").startswith("ゼロキュウ")


def test_ja_phonemizer_fuzz_no_crash():
    """Seeded fuzz: the JA phonemizer (both modes) must never raise on
    arbitrary mixed-script text, and the end-to-end contract —
    tokenizer(phonemizer(s)) — must yield only in-vocabulary ids.
    (The phonemizer itself passes unknown characters through as their
    own token, reference parity per tests/test_text.py's garbage case;
    BasicTokenizer.encode is the layer that drops them.)"""
    import random

    import numpy as np

    from voice100_tpu.text.tokenizers import get_tokenizer

    random.seed(5678)
    tok = get_tokenizer(language="ja", use_phone=True)
    ph_char = JapanesePhonemizer(use_phone=False)
    ph_phone = JapanesePhonemizer(use_phone=True)
    pools = [
        "日本語の漢字龍鷹麒麟",      # common + out-of-table kanji
        "あいうえおゃゅょっんー",
        "アイウエオヴヵヶ・",
        "0123456789０１２３",
        "abcXYZ .,!?「」()『』",
        "々〆〇　\U0001F600",
    ]
    for _ in range(400):
        n = random.randint(0, 24)
        s = "".join(random.choice(random.choice(pools)) for _ in range(n))
        out_c = ph_char(s)
        assert isinstance(out_c, str)
        ids = np.asarray(tok(ph_phone(s)))
        assert ids.ndim == 1
        assert ((ids >= 0) & (ids < tok.vocab_size)).all(), s


def test_newspaper_band_jukugo():
    """Probe round 17: the high-frequency newspaper-band kanji batch
    (自/民/的/題/験/能/積/組...) forms unlisted jukugo by plain ON
    concatenation and keeps kun verb stems (当たる, 求める, 組む vs
    the クミ isolated noun); 組織/番組 are lexicalized compounds."""
    reader = LexiconReader()
    cases = {
        "自動車が走る": "ジドウシャガハシル",
        "問題があります": "モンダイガアリマス",
        "目的を持つ": "モクテキヲモツ",
        "以上です": "イジョウデス",
        "午前九時": "ゴゼンクジ",
        "試験に合格した": "シケンニゴウカクシタ",
        "性能がいい": "セイノウガイイ",
        "面積が広い": "メンセキガヒロイ",
        "組織で働く": "ソシキデハタラク",
        "チームを組みます": "チームヲクミマス",
        "番組を見る": "バングミヲミル",
        "当たりました": "アタリマシタ",
        "求めます": "モトメマス",
        "示します": "シメシマス",
        "月が満ちた": "ツキガミチタ",
        "庭を囲んで": "ニワヲカコンデ",
        "雪が積もる": "ユキガツモル",
        "他の人": "ホカノヒト",
        "お化けが現れた": "オバケガアラワレタ",
        "関係があります": "カンケイガアリマス",
        "仕事に関わる": "シゴトニカカワル",
        "昨年の経歴": "サクネンノケイレキ",
        "自民党の総裁": "ジミントウノソウサイ",
        "布を織る": "ヌノヲオル",
    }
    for surface, want in cases.items():
        assert _read(reader, surface) == want, (
            surface, _read(reader, surface))


def test_no_duplicate_reading_table_keys():
    """A duplicate key in the dict literals silently drops the earlier
    entry (last-wins): a conflicting re-addition would shadow a
    correct reading with no test failure unless the word is in a gold
    sentence. Enforce uniqueness at the source level."""
    import ast
    import collections
    import voice100_tpu.text.japanese.readings as readings

    tree = ast.parse(open(readings.__file__).read())
    for node in ast.walk(tree):
        target = None
        if isinstance(node, ast.Assign) and node.targets:
            target = getattr(node.targets[0], "id", None)
        elif isinstance(node, ast.AnnAssign):
            target = getattr(node.target, "id", None)
        if target in ("_TABLE", "COMPOUNDS", "KUN_OKURI") and isinstance(
            node.value, ast.Dict
        ):
            keys = []
            for k in node.value.keys:
                try:
                    keys.append(ast.literal_eval(k))
                except ValueError:
                    pass
            dup = [k for k, c in collections.Counter(keys).items() if c > 1]
            assert not dup, (target, dup)
